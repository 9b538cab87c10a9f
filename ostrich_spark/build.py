"""Index build: corpus DataFrame -> partitioned inverted-index segments.

Spark-first re-expression of ostrich's write path
(/root/reference/indexer/index_writer.go:80-152,
/root/reference/indexer/segment_writer.go:34-82,
/root/reference/internal/postings/postings_writer.go:89-140):

- one input partition == one index segment (like one batch == one segment,
  index_writer.go:118-142), built inside a single ``mapInPandas`` pass —
  tokenization, tf-counting, posting assembly and packing are all
  vectorized pandas/numpy; NO per-row Python, NO shuffle (postings stay
  partition-local; the only shuffle in the whole build is the
  deterministic ``repartitionByRange`` of the corpus itself).
- local docIDs are dense 0..maxDoc-1 in deterministic order-key order
  (segment_writer.go:35,65 assigns insertion order).
- each task writes its segment directory durably (postings/norms/docmap
  parquet + fragment.json checkpoint) BEFORE the driver commits the
  manifest — the resumability contract: a restarted build skips
  partitions whose fragment already exists (north rule).
- field norms (token count per doc*field) are first-class — the
  reference's acknowledged TODO (postings_writer.go:91-94) — enabling
  BM25.

At 100 TB scale: partitions are sized by the input splits
(``spark.sql.files.maxPartitionBytes``); per-task memory is bounded by
the partition's token count; segment writes go to the executor-visible
filesystem/object store; the manifest commit is a driver-side atomic
rename. Posting lists may span MULTIPLE parquet rows (sharded by doc
range) so no single term ever forces a giant row — this is the skew
story: merge never needs a per-term reduce for huge terms (see merge.py).
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import time
import uuid
from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .analysis import get_analyzer
from .codec import (
    BLOCK_SIZE,
    block_metadata,
    pack_blocked,
    pack_pos_doc_aligned,
)
from .lock import locked_writer
from .manifest import (
    FRAGMENT_NAME,
    Manifest,
    SegmentMeta,
    atomic_write_json,
    load_fragment,
    manifest_exists,
    load_manifest,
    save_manifest,
    segment_dir,
)
from .schema import Schema, geo_lat_col, geo_lon_col

# Posting rows: one or more rows per (segment, field, term); multi-row
# lists are doc-range sharded (row_ord orders them).
POSTINGS_ARROW_SCHEMA = pa.schema(
    [
        ("segment_id", pa.string()),
        ("field", pa.int32()),
        ("term", pa.string()),
        ("row_ord", pa.int64()),
        ("doc_freq", pa.int64()),
        ("total_tf", pa.int64()),
        ("docs", pa.binary()),
        ("tfs", pa.binary()),
        ("lens", pa.binary()),
        ("doc_offs", pa.list_(pa.int64())),
        ("tf_offs", pa.list_(pa.int64())),
        ("len_offs", pa.list_(pa.int64())),
        ("block_max_doc", pa.list_(pa.int64())),
        ("block_max_tf", pa.list_(pa.int64())),
        ("block_min_len", pa.list_(pa.int64())),
        # per-occurrence token positions (phrase support): flat varint
        # array of within-doc positions, doc-major (tf values per doc,
        # boundaries = cumsum(tfs)); empty when the field's schema has
        # positions=False
        ("pos", pa.binary()),
        ("pos_offs", pa.list_(pa.int64())),
    ]
)

NORMS_ARROW_SCHEMA = pa.schema(
    [
        ("segment_id", pa.string()),
        ("doc", pa.int64()),
        ("field", pa.int32()),
        ("length", pa.int64()),
    ]
)

METRICS_SPARK_SCHEMA = (
    "partition_id int, segment_id string, max_doc long, n_terms long, "
    "n_tokens long, n_posting_rows long, bytes_postings long, wall_ms long, "
    "skipped boolean, attempt int"
)


def _sha256_hex(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def _text_tok_sha(col: "pd.Series"):
    """Tokenizer/sha input strings of one text field's raw column.

    Multi-valued text (repeated FieldValues, schema/document.go:20-46):
    token streams are concatenated — for this tokenizer that's exactly
    space-joining the values (space is a separator and tokens never
    contain spaces), so the vectorized path is kept. The sha string
    joins values with NUL (value boundaries stay visible to the content
    invariant)."""
    is_multi = col.map(lambda v: isinstance(v, (list, tuple, np.ndarray))).any()
    if is_multi:
        as_list = col.map(
            lambda v: [str(x) for x in v]
            if isinstance(v, (list, tuple, np.ndarray))
            else ["" if v is None else str(v)]
        )
        return as_list.map(" ".join), as_list.map("\x00".join)
    return col, col.fillna("").astype(str)


def build_segment_tables(
    pdf_iter: Iterator[pd.DataFrame],
    schema: Schema,
    segment_id: str,
    id_cols: list[str],
    analyzers: dict[str, "object"] | None = None,
    id_arrow_types: dict[str, "pa.DataType"] | None = None,
):
    """Pure function: corpus batches -> (postings, norms, docmap) tables.

    Vectorized: tokenize per field via the analyzer chain, then
    explode (np.repeat) -> pandas groupby(term, doc).size() for tf
    counting (I2: postings_writer.go:127-135), then per-term packed
    posting assembly (I3/I4).
    """
    batches = [b for b in pdf_iter if len(b)]
    if not batches:
        return None
    pdf = pd.concat(batches, ignore_index=True) if len(batches) > 1 else batches[0]
    n_docs = len(pdf)
    local_ids = np.arange(n_docs, dtype=np.int64)

    postings_cols: dict[str, list] = {k.name: [] for k in POSTINGS_ARROW_SCHEMA}
    norms_frames = []
    sha_parts = None
    n_tokens_total = 0
    field_tokens: dict[str, int] = {}

    for fe in schema.fields:
        if fe.is_doc_value:
            # numeric/keyword doc-value field: no tokens, no postings, no
            # norms — the typed value is written into the docmap below.
            # Excluded from content_sha256 (the TEXT-content invariant).
            continue
        src = fe.input_col  # ES multi-fields: may differ from fe.name
        col = pdf[src] if src in pdf.columns else pd.Series([""] * n_docs)
        tok_col, sha_col = _text_tok_sha(col)
        # ES copy_to: other text fields' RAW values also index into this
        # field (re-analyzed below with THIS field's analyzer — the ES
        # pre-analysis copy contract). Concatenation == appending more
        # values to a multi-valued field (space-joining, the documented
        # convention). content_sha256 keeps hashing each field's OWN
        # value only — the per-row content invariant is copy_to-blind.
        copy_srcs = [
            f2 for f2 in schema.fields
            if not f2.is_doc_value and fe.name in f2.copy_to
        ]
        if copy_srcs:
            base = tok_col.fillna("").astype(str)
            for f2 in copy_srcs:
                c2 = (
                    pdf[f2.input_col]
                    if f2.input_col in pdf.columns
                    else pd.Series([""] * n_docs)
                )
                t2, _ = _text_tok_sha(c2)
                base = base + " " + t2.fillna("").astype(str)
            tok_col = base
        # custom analyzers (e.g. SynonymFilter chains) registered on the
        # DRIVER are shipped in via `analyzers` — the executor's registry
        # only has the built-ins
        analyzer = (analyzers or {}).get(fe.analyzer) or get_analyzer(fe.analyzer)
        flat_tokens, lens = analyzer.analyze_flat(tok_col)
        n_tokens_total += int(lens.sum())
        field_tokens[str(fe.id)] = int(lens.sum())

        # per-row sha of the raw field value (content invariant)
        field_sha = sha_col.map(_sha256_hex)
        sha_parts = field_sha if sha_parts is None else sha_parts + field_sha

        norms_frames.append(
            pd.DataFrame(
                {
                    "segment_id": segment_id,
                    "doc": local_ids,
                    "field": np.int32(fe.id),
                    "length": lens,
                }
            )
        )

        if lens.sum() == 0:
            continue
        # tf counting on INTEGER keys: dictionary-encode the flat token
        # stream (Arrow C++ hashing), rank the dictionary lexicographically,
        # then one np.unique over rank*n_docs+doc yields (term asc, doc asc)
        # runs with counts — no object-dtype groupby, no per-doc lists.
        d = flat_tokens.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dic = np.asarray(d.dictionary.to_pylist(), dtype=object)
        order = np.argsort(dic)
        rank = np.empty(len(order), dtype=np.int64)
        rank[order] = np.arange(len(order))
        sorted_dic = dic[order]
        flat_docs = np.repeat(local_ids, lens)
        key = rank[codes] * n_docs + flat_docs
        if fe.positions:
            # stable sort keeps occurrence order (= ascending within-doc
            # position) inside each (term, doc) run, giving the same
            # (uniq, counts) as np.unique PLUS per-occurrence positions
            doc_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            within_pos = np.arange(len(flat_docs), dtype=np.int64) - np.repeat(
                doc_starts, lens
            )
            occ_order = np.argsort(key, kind="stable")
            sorted_key = key[occ_order]
            sorted_pos = within_pos[occ_order]
            occ_change = np.flatnonzero(sorted_key[1:] != sorted_key[:-1]) + 1
            occ_starts = np.concatenate(([0], occ_change))
            uniq = sorted_key[occ_starts]
            tf_counts = np.diff(np.concatenate((occ_starts, [len(sorted_key)])))
        else:
            sorted_pos = occ_starts = None
            uniq, tf_counts = np.unique(key, return_counts=True)
        term_idx = uniq // n_docs
        docs_arr = uniq % n_docs
        tfs_arr = tf_counts.astype(np.int64)
        # doc length per posting (aligned), for BM25 and block_min_len;
        # posting lists come out docID-sorted within each term run, like
        # the reference's insertion-order invariant
        # (postings_writer.go:137-140).
        lens_arr = lens[docs_arr]
        change = np.flatnonzero(term_idx[1:] != term_idx[:-1]) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(term_idx)]))

        occ_bounds = (
            np.concatenate((occ_starts, [int(lens.sum())])) if fe.positions else None
        )
        for s, e in zip(starts, ends):
            term = sorted_dic[term_idx[s]]
            pdocs, ptfs, plens = docs_arr[s:e], tfs_arr[s:e], lens_arr[s:e]
            docs_b, doc_offs = pack_blocked(pdocs, delta=True)
            tfs_b, tf_offs = pack_blocked(ptfs, delta=False)
            lens_b, len_offs = pack_blocked(plens, delta=False)
            bmax_doc, bmax_tf, bmin_len = block_metadata(pdocs, ptfs, plens)
            if fe.positions:
                # DOC-ALIGNED position blocks (pos block i == doc block
                # i) so phrase/near queries can decode a block subset —
                # see codec.pack_pos_doc_aligned; flagged in
                # manifest.stats["pos_layout"]
                pos_b, pos_offs = pack_pos_doc_aligned(
                    sorted_pos[occ_bounds[s] : occ_bounds[e]], ptfs
                )
            else:
                pos_b, pos_offs = b"", []
            postings_cols["segment_id"].append(segment_id)
            postings_cols["field"].append(fe.id)
            postings_cols["term"].append(term)
            postings_cols["row_ord"].append(0)
            postings_cols["doc_freq"].append(int(e - s))
            postings_cols["total_tf"].append(int(ptfs.sum()))
            postings_cols["docs"].append(docs_b)
            postings_cols["tfs"].append(tfs_b)
            postings_cols["lens"].append(lens_b)
            postings_cols["doc_offs"].append(doc_offs)
            postings_cols["tf_offs"].append(tf_offs)
            postings_cols["len_offs"].append(len_offs)
            postings_cols["block_max_doc"].append(bmax_doc)
            postings_cols["block_max_tf"].append(bmax_tf)
            postings_cols["block_min_len"].append(bmin_len)
            postings_cols["pos"].append(pos_b)
            postings_cols["pos_offs"].append(pos_offs)

    postings_tbl = pa.table(postings_cols, schema=POSTINGS_ARROW_SCHEMA)
    norms_tbl = pa.Table.from_pandas(
        pd.concat(norms_frames, ignore_index=True), schema=NORMS_ARROW_SCHEMA, preserve_index=False
    )

    docmap = pd.DataFrame({"segment_id": segment_id, "doc": local_ids})
    for c in id_cols:
        docmap[c] = pdf[c].to_numpy()
    # stored fields (schema store=True): raw value rides the docmap — the
    # real StoreWriter the reference stubs out; enables retrieval and
    # snippet highlighting without going back to the source table
    for fe in schema.fields:
        if fe.store and fe.name not in docmap.columns:
            if fe.input_col in pdf.columns:
                raw = pdf[fe.input_col].map(
                    lambda v: "\n".join(str(x) for x in v)
                    if isinstance(v, (list, tuple, np.ndarray))
                    else ("" if v is None else str(v))
                )
            else:
                raw = pd.Series([""] * n_docs)
            docmap[fe.name] = raw.to_numpy()
    # numeric doc values: typed docmap columns (parquet min/max row-group
    # stats make range reads prunable — the Lucene-points analog)
    for fe in schema.fields:
        if not fe.is_numeric or fe.name in docmap.columns:
            continue
        if fe.input_col in pdf.columns:
            vals = pd.to_numeric(pdf[fe.input_col], errors="raise")
            docmap[fe.name] = (
                vals.astype("Int64")
                if fe.field_type == "long"
                else vals.astype("float64")
            )
        else:
            docmap[fe.name] = (
                pd.array([None] * n_docs, dtype="Int64")
                if fe.field_type == "long"
                else np.full(n_docs, np.nan)
            )
    # date doc values: int64 epoch micros, projected JVM-side by
    # _project_date_micros (NULL = no value, like every doc-value type)
    for fe in schema.fields:
        if not fe.is_date or fe.name in docmap.columns:
            continue
        dcol = date_input_col(fe.name)
        if dcol in pdf.columns:
            docmap[fe.name] = pdf[dcol].astype("Int64")
        else:
            docmap[fe.name] = pd.array([None] * n_docs, dtype="Int64")
    # keyword doc values: raw strings, NULL-preserving (a missing value is
    # no value — it never matches equality or exists). A "lowercase"
    # normalizer (Schema.add_keyword_field(lowercase=True)) stores the
    # normalized form — the ES keyword-normalizer convention.
    for fe in schema.fields:
        if not fe.is_keyword or fe.name in docmap.columns:
            continue
        if fe.input_col in pdf.columns:
            vals = pdf[fe.input_col].astype("string")
            if fe.analyzer == "lowercase":
                vals = vals.str.lower()
            docmap[fe.name] = vals.to_numpy(dtype=object, na_value=None)
        else:
            docmap[fe.name] = np.full(n_docs, None, dtype=object)
    # ip doc values: IPv4/IPv6 literals (or already-canonical hex — the
    # reindex shape) encoded to the canonical 32-hex form (ip.ip_hex);
    # NULL/empty = no value, malformed raises (a silently dropped
    # address is a corrupt index). Stored as a plain string column —
    # fixed-width hex makes parquet string min/max stats prune CIDR and
    # range scans exactly like keyword ranges.
    for fe in schema.fields:
        if not fe.is_ip or fe.name in docmap.columns:
            continue
        if fe.input_col in pdf.columns:
            from .ip import ip_hex_series

            docmap[fe.name] = ip_hex_series(
                pdf[fe.input_col], errors="raise", field_name=fe.name
            ).to_numpy(dtype=object, na_value=None)
        else:
            docmap[fe.name] = np.full(n_docs, None, dtype=object)
    # range doc values: "lo,hi" interval strings parsed into TWO typed
    # bound columns ({name}__rlo / {name}__rhi — schema.range_lo_col/
    # range_hi_col). NULL/empty = no range; a bare "v" is the point
    # range [v, v] (the ES singleton shape); lo > hi raises.
    for fe in schema.fields:
        if not fe.is_range:
            continue
        from .schema import range_hi_col, range_lo_col

        lo_c, hi_c = range_lo_col(fe.name), range_hi_col(fe.name)
        if lo_c in docmap.columns:
            continue
        long_t = fe.field_type == "long_range"
        dt = "Int64" if long_t else "Float64"
        if fe.input_col in pdf.columns:
            raw = pdf[fe.input_col]
            has = raw.notna() & (raw.astype("string").str.strip() != "")
            lo_full = pd.array([None] * n_docs, dtype=dt)
            hi_full = pd.array([None] * n_docs, dtype=dt)
            if has.any():
                parts = (
                    raw[has].astype("string").str.split(",", n=1, expand=True)
                )
                lo_s = pd.to_numeric(parts[0].str.strip(), errors="raise")
                hi_src = (
                    parts[1] if parts.shape[1] > 1 else parts[0]
                ).fillna(parts[0])
                hi_s = pd.to_numeric(hi_src.str.strip(), errors="raise")
                if (lo_s > hi_s).any():
                    bad = lo_s.index[(lo_s > hi_s)][0]
                    raise ValueError(
                        f"range field {fe.name!r}: lo > hi in input "
                        f"{raw[bad]!r} — a silently swapped interval is "
                        f"a corrupt index"
                    )
                if long_t and not (
                    (lo_s % 1 == 0).all() and (hi_s % 1 == 0).all()
                ):
                    raise ValueError(
                        f"range field {fe.name!r}: long_range bounds "
                        f"must be integers (use double_range)"
                    )
                idx = np.flatnonzero(has.to_numpy())
                lo_full[idx] = (
                    lo_s.astype("int64") if long_t else lo_s.astype("float64")
                ).to_numpy()
                hi_full[idx] = (
                    hi_s.astype("int64") if long_t else hi_s.astype("float64")
                ).to_numpy()
            docmap[lo_c] = lo_full
            docmap[hi_c] = hi_full
        else:
            docmap[lo_c] = pd.array([None] * n_docs, dtype=dt)
            docmap[hi_c] = pd.array([None] * n_docs, dtype=dt)
    # histogram doc values: "v:c;v:c;..." pair strings parsed into the
    # paired array columns ({name}__hvals float64 / {name}__hcounts
    # int64). Values must be strictly ascending (the ES requirement),
    # counts >= 0 integers; NULL/empty = no histogram; malformed raises.
    for fe in schema.fields:
        if not fe.is_histogram:
            continue
        from .schema import hist_counts_col, hist_vals_col

        v_c, c_c = hist_vals_col(fe.name), hist_counts_col(fe.name)
        if v_c in docmap.columns:
            continue
        v_full = np.full(n_docs, None, dtype=object)
        c_full = np.full(n_docs, None, dtype=object)
        if fe.input_col in pdf.columns:
            raw = pdf[fe.input_col]
            for i, v in enumerate(raw):
                if v is None or (isinstance(v, float) and pd.isna(v)):
                    continue
                s = str(v).strip()
                if not s:
                    continue
                vals, counts = [], []
                for pair in s.split(";"):
                    a, sep, b = pair.partition(":")
                    if not sep:
                        raise ValueError(
                            f"histogram field {fe.name!r}: pair {pair!r} "
                            f"is not 'value:count'"
                        )
                    vals.append(float(a.strip()))
                    c = float(b.strip())
                    if c < 0 or c % 1 != 0:
                        raise ValueError(
                            f"histogram field {fe.name!r}: count {b!r} "
                            f"must be a non-negative integer"
                        )
                    counts.append(int(c))
                if any(x >= y for x, y in zip(vals, vals[1:])):
                    raise ValueError(
                        f"histogram field {fe.name!r}: values must be "
                        f"strictly ascending (got {vals})"
                    )
                v_full[i] = np.asarray(vals, dtype="float64")
                c_full[i] = np.asarray(counts, dtype="int64")
        docmap[v_c] = v_full
        docmap[c_c] = c_full
    # geo_shape doc values: "lat,lon;lat,lon;..." ring strings parsed
    # into 4 float64 bbox columns (parquet min/max stats prune every
    # shape query — the BKD-filter analog) + 2 array<double> ring
    # columns read only by the exact verify. NULL/empty = no shape;
    # malformed/degenerate/dateline rings raise (geo.parse_ring).
    for fe in schema.fields:
        if not fe.is_shape:
            continue
        from .geo import parse_ring
        from .schema import (
            shape_lats_col, shape_lons_col, shape_maxlat_col,
            shape_maxlon_col, shape_minlat_col, shape_minlon_col,
        )

        cols = [shape_minlat_col(fe.name), shape_maxlat_col(fe.name),
                shape_minlon_col(fe.name), shape_maxlon_col(fe.name),
                shape_lats_col(fe.name), shape_lons_col(fe.name)]
        if cols[0] in docmap.columns:
            continue
        mn_la = np.full(n_docs, np.nan)
        mx_la = np.full(n_docs, np.nan)
        mn_lo = np.full(n_docs, np.nan)
        mx_lo = np.full(n_docs, np.nan)
        r_la = np.full(n_docs, None, dtype=object)
        r_lo = np.full(n_docs, None, dtype=object)
        if fe.input_col in pdf.columns:
            raw = pdf[fe.input_col]
            for i, v in enumerate(raw):
                if v is None or pd.isna(v):
                    continue
                v = str(v).strip()
                if not v:
                    continue
                try:
                    pts = parse_ring(v)
                except ValueError as e:
                    raise ValueError(f"geo_shape field {fe.name!r}: {e}")
                la = np.array([p[0] for p in pts])
                lo = np.array([p[1] for p in pts])
                mn_la[i], mx_la[i] = la.min(), la.max()
                mn_lo[i], mx_lo[i] = lo.min(), lo.max()
                r_la[i], r_lo[i] = la, lo
        has = ~np.isnan(mn_la)
        for col, arr in zip(cols[:4], (mn_la, mx_la, mn_lo, mx_lo)):
            docmap[col] = pd.array(arr, dtype="Float64")
            docmap[col] = docmap[col].where(pd.Series(has), None)
        docmap[cols[4]] = r_la
        docmap[cols[5]] = r_lo
    # geo doc values: "lat,lon" input strings parsed into TWO float64
    # columns ({name}__lat / {name}__lon — schema.geo_lat_col/geo_lon_col).
    # NULL/empty input = no point (NULL in both columns); malformed or
    # out-of-range values raise — a silently wrapped coordinate is a
    # corrupt index, not a convenience.
    for fe in schema.fields:
        if not fe.is_geo:
            continue
        lat_c, lon_c = geo_lat_col(fe.name), geo_lon_col(fe.name)
        if lat_c in docmap.columns:
            continue
        if fe.input_col in pdf.columns:
            raw = pdf[fe.input_col]
            has = raw.notna() & (raw.astype("string").str.strip() != "")
            if not has.any():
                docmap[lat_c] = pd.array([None] * n_docs, dtype="Float64")
                docmap[lon_c] = pd.array([None] * n_docs, dtype="Float64")
                continue
            parts = raw[has].astype("string").str.split(",", n=1, expand=True)
            if has.any() and (parts.shape[1] < 2 or parts[1].isna().any()):
                raise ValueError(
                    f"geo field {fe.name!r}: input must be 'lat,lon' "
                    f"strings; got value(s) without a comma"
                )
            lat = pd.to_numeric(parts[0].str.strip(), errors="raise").astype("float64")
            lon = pd.to_numeric(parts[1].str.strip(), errors="raise").astype("float64")
            if (lat.abs() > 90).any() or (lon.abs() > 180).any():
                raise ValueError(
                    f"geo field {fe.name!r}: latitude must be in [-90, 90] "
                    f"and longitude in [-180, 180]"
                )
            lat_full = np.full(n_docs, np.nan)
            lon_full = np.full(n_docs, np.nan)
            lat_full[has.to_numpy()] = lat.to_numpy()
            lon_full[has.to_numpy()] = lon.to_numpy()
            docmap[lat_c] = pd.array(lat_full, dtype="Float64")
            docmap[lon_c] = pd.array(lon_full, dtype="Float64")
            # NaN -> NULL: a missing point is ABSENT (never matches a geo
            # predicate or exists), not a NaN that poisons comparisons
            docmap[lat_c] = docmap[lat_c].where(pd.Series(has.to_numpy()), None)
            docmap[lon_c] = docmap[lon_c].where(pd.Series(has.to_numpy()), None)
        else:
            docmap[lat_c] = pd.array([None] * n_docs, dtype="Float64")
            docmap[lon_c] = pd.array([None] * n_docs, dtype="Float64")
    docmap["content_sha256"] = (
        sha_parts.to_numpy() if sha_parts is not None else np.full(n_docs, "", object)
    )
    # explicit Arrow schema: a partition whose id/stored column is
    # entirely NULL must still write the column's TRUE type — pandas
    # inference would emit arrow `null` (stored as INT32 in parquet) and
    # poison every mergeSchema docmap read across segments
    id_arrow_types = id_arrow_types or {}
    fields = []
    for c in docmap.columns:
        if c == "segment_id" or c == "content_sha256":
            fields.append(pa.field(c, pa.string()))
        elif c == "doc":
            fields.append(pa.field(c, pa.int64()))
        elif c in id_arrow_types:
            fields.append(pa.field(c, id_arrow_types[c]))
        else:
            fe = next((f for f in schema.fields if f.name == c), None)
            if fe is not None and (fe.is_numeric or fe.is_date):
                fields.append(
                    pa.field(c, pa.float64() if fe.field_type == "double" else pa.int64())
                )
            elif c.endswith("__lat") or c.endswith("__lon") or c.endswith(
                ("__smin_lat", "__smax_lat", "__smin_lon", "__smax_lon")
            ):
                # geo point pair / shape bbox columns — plain float64
                fields.append(pa.field(c, pa.float64()))
            elif c.endswith(("__rlo", "__rhi")):
                # range field bound pair — typed by the owning field
                rfe = next(
                    (f for f in schema.fields if f.name == c[: -len("__rlo")]),
                    None,
                )
                fields.append(
                    pa.field(
                        c,
                        pa.int64()
                        if rfe is not None and rfe.field_type == "long_range"
                        else pa.float64(),
                    )
                )
            elif c.endswith(("__ring_lats", "__ring_lons")):
                # geo_shape ring vertex arrays
                fields.append(pa.field(c, pa.list_(pa.float64())))
            elif c.endswith("__hvals"):
                fields.append(pa.field(c, pa.list_(pa.float64())))
            elif c.endswith("__hcounts"):
                fields.append(pa.field(c, pa.list_(pa.int64())))
            else:  # stored text fields are stringified above
                fields.append(pa.field(c, pa.string()))
    docmap_tbl = pa.Table.from_pandas(
        docmap, schema=pa.schema(fields), preserve_index=False
    )
    return postings_tbl, norms_tbl, docmap_tbl, n_docs, n_tokens_total, field_tokens


def _write_segment_atomic(seg_dir: str, tables, fragment: dict) -> None:
    """Write to a tmp dir then rename — task retries / speculative attempts
    race safely (first rename wins)."""
    postings_tbl, norms_tbl, docmap_tbl = tables
    tmp = f"{seg_dir}.tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    # rows are (field, term)-sorted; modest row groups give the parquet
    # reader real (field, term) row-group stats to skip on term lookups
    pq.write_table(postings_tbl, os.path.join(tmp, "postings.parquet"), row_group_size=4096)
    pq.write_table(norms_tbl, os.path.join(tmp, "norms.parquet"))
    pq.write_table(docmap_tbl, os.path.join(tmp, "docmap.parquet"))
    with open(os.path.join(tmp, FRAGMENT_NAME), "w") as f:
        json.dump(fragment, f, indent=1, sort_keys=True)
    try:
        os.rename(tmp, seg_dir)
    except OSError:
        # another attempt won the race; ours is redundant
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


def date_input_col(name: str) -> str:
    """Internal derived-column name carrying a date field's epoch-micros
    value from the JVM-side projection into the pandas build."""
    return f"__date_us_{name}"


def _ntz_wall_micros(col):
    """Wall-clock epoch micros of a TIMESTAMP_NTZ column, computed by
    parts (date / hour / minute / fractional second) — every piece is
    timezone-free on NTZ, so the result is the wall clock read AS UTC
    under any session timezone. (A plain ``cast('timestamp')`` would
    interpret the wall clock in the SESSION zone instead.)"""
    from pyspark.sql import functions as F

    return (
        F.unix_date(col.cast("date")).cast("long") * F.lit(86_400_000_000)
        + F.hour(col).cast("long") * F.lit(3_600_000_000)
        + F.minute(col).cast("long") * F.lit(60_000_000)
        + (F.date_part(F.lit("SECOND"), col) * F.lit(1_000_000)).cast("long")
    )


def date_micros_expr(col, dtype, field_name: str):
    """Column expression converting one date-field input column of type
    ``dtype`` to int64 epoch MICROS per the add_date_field dtype
    contract (timestamp → instant via unix_micros; ntz/string/date →
    UTC wall clock; long → pass-through). Shared by the build projection
    and the percolator's incoming-document scan so both sides of a
    stored date-range subscription read values identically."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if isinstance(dtype, T.TimestampType):
        return F.unix_micros(col)
    if isinstance(dtype, T.TimestampNTZType):
        # NTZ is a timezone-less wall clock: read it as UTC
        return _ntz_wall_micros(col)
    if isinstance(dtype, T.DateType):
        # days since epoch — timezone-free by construction
        return (F.unix_date(col).cast("long") * F.lit(86_400_000_000)).cast("long")
    if isinstance(dtype, T.StringType):
        # ISO-8601 wall clock, read as UTC (parsed to NTZ first so the
        # session zone never applies); unparseable values become NULL
        # (no value — never matches range/exists)
        return _ntz_wall_micros(F.to_timestamp_ntz(col))
    if isinstance(dtype, T.LongType):
        # already epoch micros (reindex / export round-trip shape)
        return col
    raise ValueError(
        f"date field {field_name!r}: input column has type "
        f"{dtype.simpleString()} — expected timestamp, timestamp_ntz, "
        f"date, string (ISO-8601), or long (epoch micros)"
    )


def _project_date_micros(df, schema: Schema, keep: set | None = None):
    """Project each date field's input column to int64 epoch MICROS
    (UTC) JVM-side, BEFORE the build's mapInPandas. Doing the conversion
    in the JVM matters: ``unix_micros`` on a TimestampType column is an
    instant function (session-timezone-proof), whereas Arrow hands
    mapInPandas naive session-LOCAL wall clocks. The derived column gets
    its own name so multi-fields sharing the source column see it
    untouched. Dtype contract (see Schema.add_date_field): timestamp →
    unix_micros; ntz/string/date → UTC wall clock; long → already
    micros; anything else fails fast."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for fe in schema.fields:
        if not fe.is_date or fe.input_col not in df.columns:
            continue
        v = date_micros_expr(
            F.col(fe.input_col), df.schema[fe.input_col].dataType, fe.name
        )
        df = df.withColumn(date_input_col(fe.name), v)
    # raw inputs consumed ONLY by date fields don't need to ride the
    # build shuffle — the derived micros column replaces them
    if keep is not None:
        still_needed = set(keep) | {
            fe.input_col for fe in schema.fields if not fe.is_date
        }
        droppable = {
            fe.input_col
            for fe in schema.fields
            if fe.is_date and fe.input_col in df.columns
        } - still_needed
        if droppable:
            df = df.drop(*sorted(droppable))
    return df


@locked_writer("build")
def build_index(
    spark,
    corpus_df,
    schema: Schema,
    index_dir: str,
    num_partitions: int = 8,
    order_col: str | None = None,
    id_cols: list[str] | None = None,
    build_id: str = "build0",
    fail_after_partitions: int | None = None,
    mode: str = "overwrite",
) -> Manifest:
    """Build (or resume) an index from a corpus DataFrame.

    ``order_col`` gives the deterministic document order (and hence the
    deterministic partition assignment via repartitionByRange); defaults
    to the first id column.
    ``fail_after_partitions`` is a test hook: tasks beyond that many
    completed fragments raise, simulating a mid-build crash for the
    resumability tests.
    ``mode='append'`` keeps the committed manifest's segments and adds
    the new ones (incremental ingestion: each batch becomes new segments,
    like IndexWriter.Commit on a live index — index_writer.go:144-152);
    'overwrite' commits a manifest containing only this build's segments.
    """
    id_cols = list(id_cols or [])
    if order_col is None:
        order_col = id_cols[0] if id_cols else schema.fields[0].name
    os.makedirs(index_dir, exist_ok=True)
    schema.validate_copy_to()

    if mode == "append" and manifest_exists(index_dir):
        committed = load_manifest(index_dir)
        if not schema.extends(committed.schema):
            # FieldID is positional: appending under a reordered/retyped
            # schema silently re-addresses every committed posting. Only
            # append-only extensions (see manifest.add_field) are sound.
            raise ValueError(
                "append schema must be an append-only extension of the "
                "committed schema (same fields, same order, same flags; "
                "new fields only at the end) — load it with "
                "load_manifest(index_dir).schema or evolve it with "
                "manifest.add_field"
            )
        if any(
            # exact-id comparisons only: a suffix test would false-positive
            # when one build_id is a dash-suffix of another (e.g. 'upd-x'
            # vs 'entry-upd-x'), rejecting a legitimately fresh append
            s.lineage.get("build_id") == build_id
            or re.fullmatch(rf"seg\d+-{re.escape(build_id)}", s.segment_id)
            for s in committed.segments
        ):
            # without this guard every partition takes the checkpoint-hit
            # path (fragments from the committed build still exist), the
            # new batch is silently NOT indexed, and its token stats are
            # double-counted into avgdl
            raise ValueError(
                f"build_id {build_id!r} was already committed to this index; "
                "append requires a fresh build_id per batch (rerunning a "
                "CRASHED append with its own id resumes fine — that build "
                "was never committed)"
            )

    field_inputs = [f.input_col for f in schema.fields]
    needed = list(dict.fromkeys([*field_inputs, *id_cols, order_col]))
    df = corpus_df.select(*[c for c in needed if c in corpus_df.columns])
    df = _project_date_micros(df, schema, keep={*id_cols, order_col})
    df = df.repartitionByRange(num_partitions, order_col).sortWithinPartitions(order_col)

    schema_json = schema.to_json()
    # resolve analyzers on the DRIVER (fails fast on an unregistered
    # name) and ship the objects into the build closure — executors
    # only have the built-in registry
    analyzers = {
        fe.analyzer: get_analyzer(fe.analyzer)
        for fe in schema.fields
        if not fe.is_doc_value
    }
    idx_dir = index_dir
    bid = build_id
    fail_after = fail_after_partitions
    # id columns' TRUE Arrow types, resolved from the Spark schema on the
    # driver: an executor partition where the column is all-NULL cannot
    # infer them (see build_segment_tables docmap schema note)
    from pyspark.sql.pandas.types import to_arrow_type

    id_arrow_types = {
        c: to_arrow_type(df.schema[c].dataType)
        for c in id_cols
        if c in df.schema.names
    }

    def build_partition(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        attempt = ctx.attemptNumber() if ctx else 0
        seg_id = f"seg{pid:05d}-{bid}"
        sdir = segment_dir(idx_dir, seg_id)
        t0 = time.time()

        frag = load_fragment(idx_dir, seg_id)
        if frag is not None and frag.get("build_id") == bid:
            # checkpoint hit: this partition's segment is already durable
            yield pd.DataFrame(
                [
                    {
                        "partition_id": pid,
                        "segment_id": seg_id,
                        "max_doc": frag["max_doc"],
                        "n_terms": frag["metrics"]["n_terms"],
                        "n_tokens": frag["metrics"]["n_tokens"],
                        "n_posting_rows": frag["metrics"]["n_posting_rows"],
                        "bytes_postings": frag["metrics"]["bytes_postings"],
                        "wall_ms": 0,
                        "skipped": True,
                        "attempt": attempt,
                    }
                ]
            )
            return

        if fail_after is not None:
            seg_root = os.path.join(idx_dir, "segments")
            done = len(os.listdir(seg_root)) if os.path.isdir(seg_root) else 0
            if done >= fail_after:
                raise RuntimeError(f"injected failure after {done} fragments")

        sch = Schema.from_json(schema_json)
        built = build_segment_tables(
            iterator, sch, seg_id, id_cols, analyzers, id_arrow_types
        )
        if built is None:
            # empty partitions never become segments
            # (indexer/segment_manager.go:60-66: empty-segment removal)
            yield pd.DataFrame(
                [
                    {
                        "partition_id": pid,
                        "segment_id": seg_id,
                        "max_doc": 0,
                        "n_terms": 0,
                        "n_tokens": 0,
                        "n_posting_rows": 0,
                        "bytes_postings": 0,
                        "wall_ms": int((time.time() - t0) * 1000),
                        "skipped": False,
                        "attempt": attempt,
                    }
                ]
            )
            return
        postings_tbl, norms_tbl, docmap_tbl, n_docs, n_tokens, field_tokens = built
        import pyarrow.compute as pc

        bytes_postings = int(
            (pc.sum(pc.binary_length(postings_tbl.column("docs"))).as_py() or 0)
            + (pc.sum(pc.binary_length(postings_tbl.column("tfs"))).as_py() or 0)
        )
        metrics = {
            "n_terms": postings_tbl.num_rows,
            "n_tokens": n_tokens,
            "n_posting_rows": postings_tbl.num_rows,
            "bytes_postings": bytes_postings,
            "field_tokens": field_tokens,
            "wall_ms": int((time.time() - t0) * 1000),
        }
        fragment = {
            "segment_id": seg_id,
            "build_id": bid,
            "partition_id": pid,
            "max_doc": n_docs,
            "metrics": metrics,
            "lineage": {"build_id": bid, "partition_id": pid, "attempt": attempt},
        }
        _write_segment_atomic(sdir, (postings_tbl, norms_tbl, docmap_tbl), fragment)
        yield pd.DataFrame(
            [
                {
                    "partition_id": pid,
                    "segment_id": seg_id,
                    "max_doc": n_docs,
                    "n_terms": postings_tbl.num_rows,
                    "n_tokens": n_tokens,
                    "n_posting_rows": postings_tbl.num_rows,
                    "bytes_postings": bytes_postings,
                    "wall_ms": metrics["wall_ms"],
                    "skipped": False,
                    "attempt": attempt,
                }
            ]
        )

    _t_map = time.time()
    metrics_rows = df.mapInPandas(build_partition, schema=METRICS_SPARK_SCHEMA).collect()
    map_sec = time.time() - _t_map
    _t_commit = time.time()

    # driver-side commit (I12/I13): collect fragments -> sorted manifest ->
    # atomic write. Empty segments are dropped.
    segments = []
    total_tokens = 0
    field_tokens: dict[str, int] = {}
    for r in sorted(metrics_rows, key=lambda r: r.partition_id):
        if r.max_doc == 0:
            continue
        frag = load_fragment(index_dir, r.segment_id) or {}
        segments.append(
            SegmentMeta(
                r.segment_id,
                r.max_doc,
                lineage=frag.get("lineage", {}),
                metrics=frag.get("metrics", {}),
            )
        )
        total_tokens += r.n_tokens
        for fid, n in frag.get("metrics", {}).get("field_tokens", {}).items():
            field_tokens[fid] = field_tokens.get(fid, 0) + n

    prior = load_manifest(index_dir) if manifest_exists(index_dir) else None
    opstamp = (prior.opstamp + 1) if prior else 1
    # position-block layout: fresh builds write doc-aligned blocks; an
    # append onto a pre-r4 (occurrence-aligned) index leaves the flag
    # off so readers keep the always-correct full-decode path for the
    # mixed segment set
    pos_aligned = (
        mode != "append"
        or prior is None
        or prior.stats.get("pos_layout") == "doc_aligned"
    )
    if mode == "append" and prior is not None:
        existing_ids = {s.segment_id for s in prior.segments}
        segments = prior.segments + [s for s in segments if s.segment_id not in existing_ids]
        for fid, n in prior.stats.get("field_tokens", {}).items():
            field_tokens[fid] = field_tokens.get(fid, 0) + n
        total_tokens += prior.stats.get("total_tokens", 0)
    # commit stage: term-stats job first, but into a STAGING dir tagged
    # with this commit's opstamp; the manifest records which opstamp its
    # stats belong to and the staging dir is renamed live only AFTER the
    # manifest save. Every crash window is safe: before save_manifest the
    # old (manifest, term_stats) pair is untouched and consistent; between
    # save_manifest and the promote, the on-disk stats' opstamp no longer
    # matches the manifest's term_stats_opstamp, so bind_stats falls back
    # to summing segment postings (correct, just slower) until the next
    # successful commit repairs the pairing.
    est_terms = sum((s.metrics or {}).get("n_terms", s.max_doc) for s in segments)
    staging = _write_term_stats_staged(
        spark, index_dir, [s.segment_id for s in segments], opstamp, est_terms
    )
    # serialize non-builtin analyzer chains into the manifest so the
    # index is self-describing (readers auto-register on load_manifest);
    # an unserializable custom filter falls back to name-only identity
    from .analysis import BUILTIN_ANALYZERS, analyzer_spec

    an_specs = {}
    for name in {
        n
        for fe in schema.fields
        if not fe.is_doc_value
        for n in (fe.analyzer, fe.query_analyzer)
        if n and n not in BUILTIN_ANALYZERS
    }:
        try:
            an_specs[name] = analyzer_spec(get_analyzer(name))
        except (KeyError, ValueError):
            pass
    manifest = Manifest(
        schema,
        segments,
        opstamp=opstamp,
        analyzers=an_specs,
        stats={
            "total_docs": sum(s.max_doc for s in segments),
            "total_tokens": total_tokens,
            "field_tokens": field_tokens,
            "build_id": build_id,
            "term_stats_opstamp": opstamp,
            **({"pos_layout": "doc_aligned"} if pos_aligned else {}),
            # phase split for scaling analysis: map_sec is the per-file
            # work (scales with executors); commit_sec is per-BUILD
            # constant (manifest + term-stats job) that amortizes to
            # zero as corpus size grows
            "build_phases": {
                "map_sec": round(map_sec, 3),
                "commit_sec": round(time.time() - _t_commit, 3),
            },
        },
    )
    save_manifest(index_dir, manifest)
    _promote_term_stats(index_dir, staging)
    if mode == "overwrite":
        # a full overwrite supersedes every prior segment — tombstones
        # referencing them are dead weight that would keep the slower
        # delete-aware query path engaged forever
        from .deletes import clear_tombstones

        clear_tombstones(index_dir)
    # the committed manifest is now the source of truth: remove segment
    # dirs it does not reference (superseded overwrites, crashed other
    # builds) so no stale postings survive on disk
    from .manifest import garbage_collect

    garbage_collect(index_dir)
    from .query.exec import invalidate_cache

    invalidate_cache(index_dir)
    return manifest


STATS_META_NAME = "_STATS_META.json"
TERM_STATS_NAME = "term_stats.parquet"
_STATS_ROWS_PER_FILE = 2_000_000


def _write_term_stats_staged(
    spark, index_dir: str, segment_ids: list[str], opstamp: int, est_terms: int
) -> str | None:
    """Commit-time global term statistics (field, term, doc_freq): the
    'term dictionary' lookup table for query-time stats binding —
    (field, term) range-partitioned sorted parquet with predicate
    pushdown on term, replacing a per-query scan over every segment
    (SegmentReader term-dict analog,
    /root/reference/reader/segment_reader.go:26-33 made global).

    Range-partitioned, NOT coalesce(1): at web scale the distinct-term
    universe is billions of rows and a single writer task would dominate
    the commit. File count targets ~2M rows/file (1 file at sandbox
    scale); each file stays (field, term)-sorted so row-group stats
    prune, and bind_stats' pyarrow dataset path reads multi-file dirs.

    Reads the EXPLICIT segment list being committed, never a segments/*
    glob — a glob would also sum doc_freq from stale/crashed segment
    dirs and silently inflate every idf.

    Writes into ``term_stats.parquet.staging-<opstamp>`` with a
    _STATS_META.json carrying the opstamp; the caller promotes it to the
    live name only after the manifest naming that opstamp is committed.
    """
    from pyspark.sql import functions as F

    from .query.exec import POSTINGS_SPARK_SCHEMA

    paths = [f"{index_dir}/segments/{sid}/postings.parquet" for sid in segment_ids]
    if not paths:
        return None
    staging = os.path.join(index_dir, f"{TERM_STATS_NAME}.staging-{opstamp}")
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    nparts = max(1, min(200, est_terms // _STATS_ROWS_PER_FILE + 1))
    stats = (
        spark.read.schema(POSTINGS_SPARK_SCHEMA)
        .parquet(*paths)
        .select("field", "term", "doc_freq")
        .groupBy("field", "term")
        .agg(F.sum("doc_freq").alias("doc_freq"))
        .repartitionByRange(nparts, "field", "term")
        .sortWithinPartitions("field", "term")
    )
    stats.write.mode("overwrite").parquet(staging)
    atomic_write_json(os.path.join(staging, STATS_META_NAME), {"opstamp": opstamp})
    return staging


def _promote_term_stats(index_dir: str, staging: str | None) -> None:
    """Swap the staged stats dir into the live name and clean stale
    staging dirs from crashed commits."""
    import glob as _glob
    import shutil

    out = os.path.join(index_dir, TERM_STATS_NAME)
    if staging is not None and os.path.isdir(staging):
        shutil.rmtree(out, ignore_errors=True)
        os.rename(staging, out)
    for stale in _glob.glob(os.path.join(index_dir, f"{TERM_STATS_NAME}.staging-*")):
        shutil.rmtree(stale, ignore_errors=True)
    # legacy single-file tmp from older builds
    shutil.rmtree(os.path.join(index_dir, f"{TERM_STATS_NAME}.tmp"), ignore_errors=True)


def reindex(
    spark,
    src_dir: str,
    dest_dir: str,
    schema: Schema,
    order_col: str | None = None,
    id_cols: list[str] | None = None,
    num_partitions: int | None = None,
    build_id: str = "reindex0",
) -> Manifest:
    """Rebuild a NEW index from a committed index's stored documents —
    the Elasticsearch ``_reindex`` analog (EXTENSION). The classic use:
    change an analyzer (default -> en_stem, add synonyms/edge-ngrams) or
    add positions/norms options without the original corpus at hand.

    Requirements: every text field of the NEW ``schema`` must exist as a
    ``store=True`` column in the source docmap (an index can only
    re-tokenize text it actually kept), and numeric fields as docmap
    doc-value columns. Tombstoned docs are EXCLUDED — reindex captures
    the live corpus, like ES _reindex.

    ``id_cols`` defaults to the source docmap's identity columns
    (everything that is not engine bookkeeping, a stored field, or a doc
    value); ``order_col`` to the first id column; ``num_partitions`` to
    the source's committed segment count.

    Scale posture: one distributed docmap scan (+ anti-join against the
    small tombstone set) feeding the normal shuffle-free build — no
    driver materialization of documents.
    """
    from .deletes import has_tombstones, read_tombstones
    from .manifest import load_manifest as _load
    from .query.exec import read_docmap

    src = _load(src_dir)
    docmap = read_docmap(spark, src_dir, src)
    cols = set(docmap.schema.names)
    missing = [
        fe.input_col for fe in schema.fields if fe.input_col not in cols
    ]
    if missing:
        raise ValueError(
            f"reindex source {src_dir!r} does not carry column(s) "
            f"{missing} — text fields must have been indexed with "
            "store=True (numeric fields as doc values) to be reindexable"
        )
    src_stored = {
        fe.name for fe in src.schema.fields if not fe.is_doc_value and fe.store
    }
    src_numeric = {fe.name for fe in src.schema.fields if fe.is_doc_value}
    bookkeeping = {"segment_id", "doc", "content_sha256"}
    inferred_ids = [
        c
        for c in docmap.schema.names
        if c not in bookkeeping and c not in src_stored and c not in src_numeric
    ]
    id_cols = list(id_cols or inferred_ids)
    if not id_cols:
        raise ValueError(
            "reindex needs identity columns (none inferable from the "
            "source docmap; pass id_cols)"
        )
    order_col = order_col or id_cols[0]
    if has_tombstones(src_dir, src):
        docmap = docmap.join(
            read_tombstones(spark, src_dir, src),
            ["segment_id", "doc"],
            "left_anti",
        )
    corpus = docmap.select(
        *dict.fromkeys(
            [*id_cols, *(fe.input_col for fe in schema.fields), order_col]
        )
    )
    return build_index(
        spark,
        corpus,
        schema,
        dest_dir,
        num_partitions=num_partitions or max(len(src.segments), 1),
        order_col=order_col,
        id_cols=id_cols,
        build_id=build_id,
    )
