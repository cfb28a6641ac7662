#!/usr/bin/env python
"""Build a scaled-up PROBE dataset (~k x sf0.1) under /tmp for the
low-core scaling investigation (VERDICT r15 #6: seven queries ran
FASTER on 8 cores than 32 at sf0.1 — prove it's fixture overhead, not
a serial section). NOT oracle data: results differ from sf0.1; only
8-core vs 32-core wall-clock ratios are read.

Each copy i shifts every entity id by i*OFF so join keys stay
consistent within a copy and never collide across copies. Dimension
tables (region, nation) are NOT duplicated (bounded key spaces by
design); fact/entity tables are. Timestamps are left unshifted (the
probe cares about volume, not time range).
"""
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

K = int(sys.argv[1]) if len(sys.argv) > 1 else 5
SRC = "/root/testdata/sf0.1"
DST = f"/tmp/sfprobe_x{K}"
OFF = 100_000_000

import os

os.makedirs(DST, exist_ok=True)

SHIFT = {
    "customer.parquet": ["c_custkey"],
    "documents.parquet": ["doc_id"],
    "embeddings.parquet": ["vec_id"],
    "events.parquet": ["event_id", "user_id"],
    "lineitem.parquet": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders.parquet": ["o_orderkey", "o_custkey"],
    "part.parquet": ["p_partkey"],
    "supplier.parquet": ["s_suppkey"],
}
COPY_ONLY = ["region.parquet", "nation.parquet"]

for t in COPY_ONLY:
    shutil.copyfile(f"{SRC}/{t}", f"{DST}/{t}")
    print("copied", t)

for t, id_cols in SHIFT.items():
    base = pq.read_table(f"{SRC}/{t}")
    parts = []
    for i in range(K):
        tb = base
        if i > 0:
            for c in id_cols:
                idx = tb.schema.get_field_index(c)
                tb = tb.set_column(
                    idx, c, pc.add(tb.column(c), i * OFF)
                )
        parts.append(tb)
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{DST}/{t}")
    print(f"wrote {t}: {base.num_rows} -> {out.num_rows} rows")
print("done:", DST)
