"""Data streams: generation-rollover index families (the Elasticsearch
data-stream / rollover analog — EXTENSION, the reference manages one
index per directory; cf. /root/reference/index/index.go which has no
multi-index surface).

A *stream* is a directory holding numbered generation indexes
(``gen-000001``, ``gen-000002``, ...) plus one ``stream.json`` listing
them in order. Appends ALWAYS target the newest generation (the ES
"write index"); :func:`rollover` cuts a fresh empty generation when the
write index trips a size condition, so no single index grows without
bound — the log-structured posture that keeps merge cost, segment
counts, and per-index recovery bounded as a 100 TB corpus accretes.
Searches fan across every generation through ``search_multi`` with
alias-GLOBAL statistics (doc_freq / N / avgdl summed across
generations), so scores are bit-identical to a single merged index —
the property the gated entry pins.

Concurrency: ``stream.json`` mutations (create / rollover) run under
the stream directory's single-writer lock and commit via atomic
temp+rename — the same AtomicWrite discipline as index manifests. Each
generation keeps its own per-index write lock during appends, so a
reader can search gen-1 while gen-2 ingests.
"""

from __future__ import annotations

import json
import os

from .build import build_index
from .lock import write_lock
from .manifest import Manifest, atomic_write_json, load_manifest, manifest_exists

STREAM_FILE = "stream.json"


class StreamError(RuntimeError):
    pass


def _stream_path(stream_dir: str) -> str:
    return os.path.join(stream_dir, STREAM_FILE)


def _gen_name(i: int) -> str:
    return f"gen-{i:06d}"


def load_stream(stream_dir: str) -> dict:
    p = _stream_path(stream_dir)
    if not os.path.exists(p):
        raise StreamError(
            f"no data stream at {stream_dir!r} — run create_stream first"
        )
    with open(p) as f:
        return json.load(f)


def _save_stream(stream_dir: str, state: dict) -> None:
    atomic_write_json(_stream_path(stream_dir), state)


def create_stream(stream_dir: str, name: str | None = None, schema=None) -> dict:
    """Create an empty stream with one (empty) write generation. Refuses
    to overwrite an existing stream. ``schema`` is the optional index
    TEMPLATE (the ES data-stream-requires-a-template rule relaxed to
    opt-in): persisted in stream.json, it makes every ``append`` use —
    and ENFORCE — one schema for all generations, so generation N can
    never drift from generation 1 and silently break the alias-global
    scoring contract."""
    os.makedirs(stream_dir, exist_ok=True)
    with write_lock(stream_dir, owner="stream-create"):
        if os.path.exists(_stream_path(stream_dir)):
            raise StreamError(f"stream already exists at {stream_dir!r}")
        state = {
            "name": name or os.path.basename(os.path.normpath(stream_dir)),
            "generations": [_gen_name(1)],
        }
        if schema is not None:
            state["template"] = schema.to_json()
        _save_stream(stream_dir, state)
    return state


def stream_template(stream_dir: str):
    """The stream's template Schema, or None if created without one."""
    from .schema import Schema

    state = load_stream(stream_dir)
    t = state.get("template")
    return Schema.from_json(t) if t is not None else None


def write_index(stream_dir: str) -> str:
    """Absolute path of the current write generation."""
    state = load_stream(stream_dir)
    return os.path.join(stream_dir, state["generations"][-1])


def stream_indexes(stream_dir: str) -> list[str]:
    """Generation dirs holding a COMMITTED manifest, oldest first — the
    searchable set (a freshly rolled, never-appended write index has no
    manifest yet and is skipped)."""
    state = load_stream(stream_dir)
    out = []
    for g in state["generations"]:
        d = os.path.join(stream_dir, g)
        if manifest_exists(d):
            out.append(d)
    return out


def append(
    spark,
    df,
    schema=None,
    stream_dir: str = None,
    num_partitions: int = 8,
    order_col: str | None = None,
    id_cols: list[str] | None = None,
    build_id: str | None = None,
    lock_wait: float = 0.0,
) -> Manifest:
    """Index ``df`` into the current write generation (incremental:
    each append commits new segments, ``build_index(mode='append')``).
    The generation's own write lock serializes concurrent appends.

    With a templated stream, ``schema`` may be omitted (the template is
    used) — and when given, it must serialize identically to the
    template: a drifted schema would score differently per generation
    and silently corrupt the alias-global stats, so it is rejected
    loudly instead."""
    tpl = stream_template(stream_dir)
    if schema is None:
        if tpl is None:
            raise StreamError(
                "append needs a schema — this stream was created without "
                "a template (pass schema=, or recreate with create_stream"
                "(..., schema=...))"
            )
        schema = tpl
    elif tpl is not None and schema.to_json() != tpl.to_json():
        raise StreamError(
            "append schema differs from the stream template — generations "
            "must share one schema (the alias-global scoring contract)"
        )
    target = write_index(stream_dir)
    # the default build_id is derived from the generation's COMMITTED
    # state, so it must be computed under the same single-writer lock
    # the build itself holds (re-entrant, build_index nests inside) —
    # computed outside, an append racing another writer would read the
    # pre-commit state and fail build_index's reuse guard with a stale
    # id instead of minting a fresh one. ``lock_wait`` > 0 lets a caller
    # queue behind a live writer instead of getting LockHeldError.
    with write_lock(target, owner="stream-append", wait=lock_wait):
        if build_id is None:
            # a committed build_id may not be reused (build_index's
            # resumability guard) — key the default off the generation's
            # committed state so each append gets a fresh id, while a
            # CRASHED append (nothing committed) naturally retries under
            # the same id and resumes its fragments
            if manifest_exists(target):
                m = load_manifest(target)
                build_id = f"stream-append-{m.opstamp}-{len(m.segments)}"
            else:
                build_id = "stream-append-0-0"
        return build_index(
            spark, df, schema, target,
            num_partitions=num_partitions, order_col=order_col,
            id_cols=id_cols, build_id=build_id, mode="append",
        )


def rollover(
    stream_dir: str,
    max_docs: int | None = None,
    max_segments: int | None = None,
    force: bool = False,
) -> dict:
    """Cut a new write generation when the CURRENT one trips any
    condition (the ES ``_rollover`` contract: conditions are OR-ed;
    ``force`` rolls unconditionally, the condition-less POST). Returns
    ``{"rolled": bool, "conditions": {name: bool}, "write_index": path}``
    — callers inspect which condition fired, like the ES response body.

    A write index with no committed manifest yet (brand-new stream or
    double rollover) never rolls: rolling an empty index would mint
    empty generations forever. Docs are counted LIVE (total minus
    tombstones would require the delete file; we use the manifest's
    committed doc total — the ES max_docs semantics, which also counts
    all docs including soft-deleted)."""
    with write_lock(stream_dir, owner="stream-rollover"):
        state = load_stream(stream_dir)
        cur = os.path.join(stream_dir, state["generations"][-1])
        conditions: dict[str, bool] = {}
        if not manifest_exists(cur):
            return {"rolled": False, "conditions": {}, "write_index": cur}
        m = load_manifest(cur)
        n_docs = int(m.stats.get("total_docs", m.total_docs))
        n_segs = len(m.segments)
        if max_docs is not None:
            conditions["max_docs"] = n_docs >= max_docs
        if max_segments is not None:
            conditions["max_segments"] = n_segs >= max_segments
        if force:
            conditions["force"] = True
        rolled = any(conditions.values())
        if rolled:
            # next number = max EXISTING generation + 1, never list length:
            # after prune_generations shrinks the list, len+1 can collide
            # with a live generation (gens [1,2,3] pruned to [2,3] would
            # mint gen-000003 again — appends would keep landing in the
            # sealed index and stream_indexes would list it twice)
            nxt = _gen_name(
                max(int(g.rsplit("-", 1)[1]) for g in state["generations"]) + 1
            )
            state["generations"] = list(state["generations"]) + [nxt]
            _save_stream(stream_dir, state)
        return {
            "rolled": rolled,
            "conditions": conditions,
            "write_index": os.path.join(stream_dir, state["generations"][-1]),
        }


def search_stream(
    spark,
    stream_dir: str,
    query,
    limit: int | None = 10,
    offset: int = 0,
    scorer: str = "tfidf",
    with_count: bool = False,
    default_fields: list[str] | None = None,
):
    """Search every committed generation as one alias — per-generation
    top-k under GLOBAL (summed) statistics, one merge; scores are
    bit-identical to the same corpus in a single index. Returns
    (results_df, count) like ``search_multi``; ``index_ord`` is the
    generation's position among the searchable set (oldest = 0). Map to
    documents with :func:`attach_stream_docmap`."""
    from .query.multi import search_multi

    dirs = stream_indexes(stream_dir)
    if not dirs:
        raise StreamError(
            f"stream {stream_dir!r} has no committed generation to search"
        )
    return search_multi(
        spark, dirs, query, limit=limit, offset=offset, scorer=scorer,
        with_count=with_count, default_fields=default_fields,
    )


def attach_stream_docmap(spark, stream_dir: str, results_df):
    from .query.multi import attach_docmap_multi

    return attach_docmap_multi(spark, stream_indexes(stream_dir), results_df)


def prune_generations(stream_dir: str, keep_last: int) -> list[str]:
    """Drop the OLDEST generations beyond the newest ``keep_last`` — the
    ES ILM delete-phase analog (retention by generation count; callers
    wanting time-based retention roll on a schedule so generation age ≡
    generation index). The write index is never pruned (``keep_last``
    is clamped to >= 1). Order is crash-safe: stream.json stops listing
    a generation BEFORE its directory is removed, so a reader racing the
    prune either sees the full old list (dirs still present) or the new
    list (dropped dirs unreferenced) — never a listed-but-deleted
    generation. Returns the pruned generation names."""
    import shutil

    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    with write_lock(stream_dir, owner="stream-prune"):
        state = load_stream(stream_dir)
        gens = state["generations"]
        if len(gens) <= keep_last:
            return []
        dropped = gens[:-keep_last]
        state["generations"] = gens[-keep_last:]
        _save_stream(stream_dir, state)
    for g in dropped:
        shutil.rmtree(os.path.join(stream_dir, g), ignore_errors=True)
    return dropped


def stream_stats(stream_dir: str) -> dict:
    """Per-generation doc/segment counts plus which one is the write
    index — the `GET _data_stream` shape."""
    state = load_stream(stream_dir)
    gens = []
    for g in state["generations"]:
        d = os.path.join(stream_dir, g)
        if manifest_exists(d):
            m = load_manifest(d)
            gens.append({
                "generation": g,
                "docs": int(m.stats.get("total_docs", m.total_docs)),
                "segments": len(m.segments),
            })
        else:
            gens.append({"generation": g, "docs": 0, "segments": 0})
    return {
        "name": state["name"],
        "write_index": state["generations"][-1],
        "generations": gens,
    }
