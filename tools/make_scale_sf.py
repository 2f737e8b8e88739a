"""Generate a K× replica of a testdata dir for the SCALE.md scaling audit.

Usage: python tools/make_scale_sf.py [SRC_DIR] [DST_DIR] [K]

Replication is designed so the WORKLOAD scales linearly with K wherever the
operator itself is linear — i.e. replicas must not collide with each other:

- orders / customer / lineitem: keys shifted per replica (o_custkey and
  c_custkey by the same delta, so FK integrity and join fan-outs are
  preserved exactly; each replica joins only with itself).
- documents: doc_id shifted; every whitespace token gets a per-replica
  suffix for i>0, so replicas share NO shingles/terms — exact and near-dup
  structure inside each replica is identical to the source, and no
  cross-replica duplicate pairs appear (plain text duplication would grow
  candidate pairs quadratically in K and measure the DATA pathology, not
  the engine).
- events: event_id/user_id shifted — K× users with identical per-user
  session structure.
- embeddings: vec_id shifted; the vector is ROTATED by i dimensions per
  replica — norm/distribution preserved, but cross-replica cosine drops to
  noise, so near-dup/ANN structure per replica matches the source.
- region/nation/part/supplier: copied unchanged (dimension tables; not the
  audit's subject).

Everything is deterministic: same inputs → byte-identical outputs.

TIMING-AUDIT ONLY — not a correctness fixture: the per-replica token
suffix rewrites ``text`` but leaves any stored derived columns
(``n_chars``, ``n_tokens``, fingerprints, …) describing the ORIGINAL
text. Suffixed replicas would silently skew any oracle that re-derives
those columns from the rewritten text; SCALE.md uses this data purely
for wall-clock ratios.

Memory: tables are processed PER ROW GROUP (``ParquetFile.iter_batches``)
and written incrementally, so driver memory is bounded by one row group
regardless of source size or K — replicating sf10 does not need an
sf10-sized driver heap.
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SHIFT = 100_000_000  # far above any source key


def _shift(t: pa.Table, name: str, delta: int) -> pa.Table:
    idx = t.schema.get_field_index(name)
    f = t.schema.field(name)
    col = pc.add(t.column(name), pa.scalar(delta, f.type)).cast(f.type)
    return t.set_column(idx, f, col)


def _suffix_tokens(t: pa.Table, name: str, i: int) -> pa.Table:
    if i == 0:
        return t
    suf = f"_{i}"
    idx = t.schema.get_field_index(name)
    vals = t.column(name).to_pylist()  # one row group's worth, not the table
    out = [
        None if s is None else " ".join(w + suf for w in s.split(" "))
        for s in vals
    ]
    return t.set_column(
        idx, t.schema.field(name), pa.array(out, t.schema.field(name).type)
    )


def _rotate_vectors(t: pa.Table, name: str, i: int) -> pa.Table:
    if i == 0:
        return t
    idx = t.schema.get_field_index(name)
    vals = t.column(name).to_pylist()  # one row group's worth, not the table
    out = []
    for v in vals:
        if v is None or len(v) == 0:
            out.append(v)
        else:
            k = i % len(v)
            out.append(v[k:] + v[:k])
    return t.set_column(
        idx, t.schema.field(name), pa.array(out, t.schema.field(name).type)
    )


REPLICATED = {
    "orders": lambda t, i: _shift(_shift(t, "o_orderkey", i * SHIFT),
                                  "o_custkey", i * SHIFT),
    "customer": lambda t, i: _shift(t, "c_custkey", i * SHIFT),
    "lineitem": lambda t, i: _shift(t, "l_orderkey", i * SHIFT),
    "documents": lambda t, i: _suffix_tokens(
        _shift(t, "doc_id", i * SHIFT), "text", i
    ),
    "events": lambda t, i: _shift(_shift(t, "event_id", i * SHIFT),
                                  "user_id", i * SHIFT),
    "embeddings": lambda t, i: _rotate_vectors(
        _shift(t, "vec_id", i * SHIFT), "embedding", i
    ),
}

COPIED = ("region", "nation", "part", "supplier")


def _replicate_streaming(src_path: str, dst_path: str, fn, k: int) -> tuple[int, int]:
    """Write K transformed replicas of src_path to dst_path one source
    row group at a time. Each (replica, row group) pair becomes its own
    output row group — the K-way-splittable multi-file shape a real table
    would have — and peak memory is a single row group."""
    pf = pq.ParquetFile(src_path)
    writer = None
    n_in = pf.metadata.num_rows
    n_out = 0
    try:
        for i in range(k):
            for batch in pf.iter_batches():
                part = fn(pa.Table.from_batches([batch]), i)
                if writer is None:
                    writer = pq.ParquetWriter(dst_path, part.schema)
                writer.write_table(part, row_group_size=part.num_rows)
                n_out += part.num_rows
    finally:
        if writer is not None:
            writer.close()
    return n_in, n_out


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_sf1.0"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    for name in COPIED:
        shutil.copy(
            os.path.join(src, f"{name}.parquet"),
            os.path.join(dst, f"{name}.parquet"),
        )
    for name, fn in REPLICATED.items():
        n_in, n_out = _replicate_streaming(
            os.path.join(src, f"{name}.parquet"),
            os.path.join(dst, f"{name}.parquet"),
            fn,
            k,
        )
        print(f"{name}: {n_in} -> {n_out} rows")


if __name__ == "__main__":
    main()
