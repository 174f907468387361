#!/usr/bin/env python3
"""Scale the driver's sf0.1 testdata 10x into an sf1 directory.

Dev tooling only (never shipped in the library): builds the corpus for
the empirical scale-shift check in SCALE.md / ScaleSpec. Each fact table
is the union of 10 copies of the sf0.1 table with every surrogate key
offset by copy_index * (max_key + 1), applied CONSISTENTLY across tables
so referential integrity (orders->customer, lineitem->orders/part/
supplier, events->user domain) is preserved and per-key fan-ins match
the original distribution. Dimension tables (region, nation) stay fixed,
like TPC-H. Physical parquet types are preserved exactly (pyarrow
concat, no pandas round-trip) -- the events table keeps its
timestamp[ns] column, which Tables.events depends on.

Usage: python3 tools/gen_sf1.py [src_dir] [dst_dir] [factor]
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# table -> columns to offset, keyed by the DOMAIN the offset must share
OFFSETS = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part",
                 "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
COPY_AS_IS = ["region", "nation"]

def main():
    import os
    os.makedirs(DST, exist_ok=True)
    # domain strides from the base tables (max key + 1 per domain)
    stride = {}
    for t, cols in OFFSETS.items():
        tab = pq.read_table(f"{SRC}/{t}.parquet")
        for c, dom in cols.items():
            m = pc.max(tab[c]).as_py() + 1
            stride[dom] = max(stride.get(dom, 0), m)
    for t in COPY_AS_IS:
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"),
                       f"{DST}/{t}.parquet")
        print(f"{t}: copied")
    for t, cols in OFFSETS.items():
        base = pq.read_table(f"{SRC}/{t}.parquet")
        copies = []
        for i in range(FACTOR):
            arrays = []
            for f in base.schema:
                col = base[f.name].combine_chunks()
                if f.name in cols and i > 0:
                    off = i * stride[cols[f.name]]
                    col = pc.add(col, pa.scalar(off, type=f.type))
                arrays.append(col)
            copies.append(pa.table(arrays, schema=base.schema))
        out = pa.concat_tables(copies)
        pq.write_table(out, f"{DST}/{t}.parquet")
        print(f"{t}: {base.num_rows} -> {out.num_rows}")

if __name__ == "__main__":
    main()
