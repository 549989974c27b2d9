#!/usr/bin/env python3
"""Scale attestation for the cluster-assignment queries whose DuckDB
oracles use WITH RECURSIVE reachability closures.

The recursive closure enumerates PATHS before deduplicating; on a corpus
with dense duplicate cliques (the 10x re-attestation corpus has ~10-doc
cliques everywhere) it blows up combinatorially even though the final
answer is tiny — observed: >99 CPU-minutes without completing at 10x,
while every non-recursive dedup oracle finishes in minutes. So at scale
we split the oracle: DuckDB still computes the EDGE evidence (the part
that is plain joins/aggregation, identical SQL prefix to the registry
oracle), and the transitive closure runs as a driver-side union-find —
the same split check_oracle.py's recursive oracles already pass at
sf0.001/0.01/0.1, where both halves are tractable.

Usage: check_clusters_unionfind.py <sfDir> <verifyOutDir>
Compares dedup_clusters, dedup_keep_summary, dedup_clusters_multi dumps.
"""
import json
import sys

import duckdb
import pandas as pd


def load_spark(outdir: str, name: str) -> pd.DataFrame:
    import glob
    files = sorted(glob.glob(f"{outdir}/{name}/part-*.parquet"))
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    return df.reindex(sorted(df.columns), axis=1)


class UF:
    def __init__(self):
        self.p = {}

    def find(self, x):
        p = self.p
        r = x
        while p.setdefault(r, r) != r:
            r = p[r]
        while p[x] != r:
            p[x], x = r, p[x]
        return r

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min-label convention: smaller id becomes the root
            if rb < ra:
                ra, rb = rb, ra
            self.p[rb] = ra


def labels_of(edges) -> dict:
    uf = UF()
    for a, b in edges:
        uf.union(int(a), int(b))
    return {n: uf.find(n) for n in list(uf.p)}


def cmp(name: str, spark: pd.DataFrame, oracle: pd.DataFrame) -> bool:
    oracle = oracle.reindex(sorted(oracle.columns), axis=1)
    ok = (
        list(spark.columns) == list(oracle.columns)
        and len(spark) == len(oracle)
        and all(
            spark[c].astype(str).tolist() == oracle[c].astype(str).tolist()
            for c in spark.columns
        )
    )
    print(("PASS" if ok else "FAIL") + f" {name} "
          f"({len(spark)} rows vs oracle {len(oracle)})")
    return ok


def main():
    sf = sys.argv[1]
    out = sys.argv[2]
    con = duckdb.connect()
    for t in ("documents",):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    # Edges-only oracles are emitted by Verify (attest_sql.json) from the
    # SAME Scala builders as the registry oracles — no string-splitting of
    # formatted SQL, no hardcoded thresholds: a constant or formatting
    # change in DedupOracle flows through automatically.
    attest = json.load(open(f"{out}/attest_sql.json"))
    j_edges = con.sql(attest["dedup_cluster_edges"]).fetchall()
    medges = con.sql(attest["dedup_cluster_multi_edges"]).fetchall()

    failures = 0

    # --- dedup_clusters: (cluster_id, cluster_size)
    lab = labels_of(j_edges)
    sizes = {}
    for n, l in lab.items():
        sizes[l] = sizes.get(l, 0) + 1
    odf = pd.DataFrame(
        sorted(((l, s) for l, s in sizes.items()), key=lambda x: (-x[1], x[0])),
        columns=["cluster_id", "cluster_size"])
    failures += not cmp("dedup_clusters", load_spark(out, "dedup_clusters"),
                        odf)

    # --- dedup_keep_summary: fingerprint half in DuckDB, labels from UF
    fx = con.sql("""
        SELECT doc_id, lang,
          doc_id = MIN(doc_id) OVER (PARTITION BY md5(lower(trim(
            regexp_replace(text, '\\s+', ' ', 'g'))))) AS keep_exact
        FROM documents""").df()
    fx["keep_nd"] = fx["doc_id"].map(
        lambda d: lab.get(int(d), int(d)) == int(d))
    g = fx.groupby("lang", as_index=False).agg(
        docs_in=("doc_id", "size"),
        exact_kept=("keep_exact", "sum"),
        neardup_kept=("keep_nd", "sum"),
        final_kept=("keep_exact",
                    lambda s: int((s & fx.loc[s.index, "keep_nd"]).sum())))
    g = g.sort_values("lang").reset_index(drop=True)
    for c in ("docs_in", "exact_kept", "neardup_kept", "final_kept"):
        g[c] = g[c].astype("int64")
    failures += not cmp("dedup_keep_summary",
                        load_spark(out, "dedup_keep_summary"), g)

    # --- dedup_clusters_multi: tagged union, UF over distinct pairs
    uedges = {(int(a), int(b)) for a, b, _ in medges}
    mlab = labels_of(uedges)
    msizes = {}
    for n, l in mlab.items():
        msizes[l] = msizes.get(l, 0) + 1
    ev = {}
    for a, b, e in medges:
        l = mlab[int(a)]
        ev.setdefault(l, {"jaccard": 0, "minhash": 0, "simhash": 0})
        ev[l][e] += 1
    rows = [(l, msizes[l], ev[l]["jaccard"], ev[l]["minhash"],
             ev[l]["simhash"]) for l in msizes]
    modf = pd.DataFrame(
        sorted(rows, key=lambda x: (-x[1], x[0])),
        columns=["cluster_id", "cluster_size", "n_jaccard_edges",
                 "n_minhash_edges", "n_simhash_edges"])
    failures += not cmp("dedup_clusters_multi",
                        load_spark(out, "dedup_clusters_multi"), modf)

    print("ALL PASS" if failures == 0 else f"{failures} FAILURES")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
