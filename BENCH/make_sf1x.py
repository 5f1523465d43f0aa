"""Build a 10x replica of /root/testdata/sf0.1 for LOCAL perf isolation only.

The driver's round-end measurement escalated to a driver-generated sf1.0
(BENCH_r06.json "sf": "1.0") that is not present under /root/testdata, so
optimization work needs a local stand-in at that scale. This replicates
sf0.1 ten times with key offsets chosen to preserve join cardinalities and
the `% 25` probe pattern; document texts get a per-replica token suffix so
dedup-family queries keep their per-replica pair structure instead of
exploding into cross-replica clone clusters.

Output: /root/repo/.bench_data/sf1x/  (NEVER used for oracle correctness —
timing only; correctness stays on the driver's deterministic SFs).
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".bench_data", "sf1x")
REPLICAS = 10

# key column -> per-replica offset (multiples of 25 preserve probe strata)
OFFSETS = {
    "l_orderkey": 100_000_000, "o_orderkey": 100_000_000,
    "o_custkey": 10_000_000, "c_custkey": 10_000_000,
    "l_partkey": 1_000_000, "p_partkey": 1_000_000,
    "l_suppkey": 1_000_000, "s_suppkey": 1_000_000,
    "doc_id": 5_000_000,
    "vec_id": 2_000_000,
    "event_id": 10_000_000, "user_id": 1_000_000,
}

REPLICATED = ["lineitem", "orders", "customer", "part", "supplier",
              "documents", "embeddings", "events"]
COPIED = ["nation", "region"]


def _replica(table: pa.Table, k: int) -> pa.Table:
    cols = {}
    for name in table.column_names:
        col = table[name]
        if k and name in OFFSETS:
            import pyarrow.compute as pc
            col = pc.add(col, OFFSETS[name] * k)
        elif k and name == "text":
            # suffix every token with a replica tag: a bijection on the
            # shingle space, so within-replica similarity structure is
            # IDENTICAL to sf0.1 and cross-replica similarity is ~zero
            tag = f"r{k}"
            col = pa.array(
                [re.sub(r"(\S+)", r"\1" + tag, t) if t is not None else None
                 for t in col.to_pylist()],
                type=pa.string(),
            )
        cols[name] = col
    return pa.table(cols, schema=None)


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    for t in COPIED:
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{DST}/{t}.parquet")
        print(t, "copied")
    for t in REPLICATED:
        src = pq.read_table(f"{SRC}/{t}.parquet")
        parts = [_replica(src, k) for k in range(REPLICAS)]
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{DST}/{t}.parquet", row_group_size=100_000)
        print(t, out.num_rows)


if __name__ == "__main__":
    main()
