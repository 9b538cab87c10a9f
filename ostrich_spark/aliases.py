"""Named alias registry — the Elasticsearch ``_aliases`` API analog.

ES keeps aliases in cluster state and mutates them through one atomic
action list (`POST _aliases {"actions": [...]}`): add/remove entries,
each optionally carrying a filter, and at most one index per alias
flagged ``is_write_index``. The whole list applies or none of it does —
the documented zero-downtime swap (`remove old + add new` in one call)
depends on that atomicity.

Our registry is a DIRECTORY holding ``aliases.json`` (so it rides the
same single-writer lock + tmp/rename swap conventions as an index
manifest — ``lock.write_lock`` works on any directory):

``{"alias": [{"index": dir, "filter": nql|null, "boost": f|null,
"is_write_index": bool}, ...]}``

in add order; re-adding an (alias, index) pair REPLACES that entry in
place (the ES update-the-alias-entry behavior). Search-time options map
onto the already-built multi-index machinery: ``resolve_alias`` hands
``query/multi.search_multi`` the dirs, per-index filters (the ES alias
``filter`` option — filter context, stats untouched) and boosts
(``indices_boost``); ``write_index`` applies the ES write rule (a
single-index alias writes to it; multiple indexes need exactly one
``is_write_index``; none flagged = rejected).

Validation happens at UPDATE time against a working copy, so a bad
action in the middle of a list leaves the file untouched: the target
index must be a committed index (manifest exists), the filter must
parse against THAT index's schema (the ES validate-filter-at-creation
behavior), boosts must be > 0, and the end state may flag at most one
write index per alias.
"""

from __future__ import annotations

import copy
import json
import os

from .lock import write_lock
from .manifest import load_manifest, manifest_exists

REGISTRY_FILE = "aliases.json"


def _path(registry_dir: str) -> str:
    return os.path.join(registry_dir, REGISTRY_FILE)


def _load(registry_dir: str) -> dict:
    try:
        with open(_path(registry_dir)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {}


def _save(registry_dir: str, reg: dict) -> None:
    os.makedirs(registry_dir, exist_ok=True)
    tmp = _path(registry_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(reg, f, indent=1, sort_keys=True)
    os.replace(tmp, _path(registry_dir))


def _validate_add(add: dict) -> dict:
    alias = add.get("alias")
    index = add.get("index")
    if not alias or not index:
        raise ValueError(f"add action needs alias and index: {add!r}")
    if not manifest_exists(index):
        raise ValueError(
            f"alias {alias!r}: {index!r} is not a committed index "
            f"(no manifest)"
        )
    flt = add.get("filter")
    if flt is not None:
        from .query.parser import QueryParseError, parse_query

        try:
            parse_query(flt, load_manifest(index).schema)
        except QueryParseError as e:
            raise ValueError(
                f"alias {alias!r}: filter does not parse against "
                f"{index!r}'s schema: {e}"
            ) from None
    boost = add.get("boost")
    if boost is not None and not float(boost) > 0:
        raise ValueError(f"alias {alias!r}: boost must be > 0, got {boost}")
    return {
        "index": os.path.realpath(index),
        "filter": flt,
        "boost": None if boost is None else float(boost),
        "is_write_index": bool(add.get("is_write_index", False)),
    }


def update_aliases(registry_dir: str, actions: list[dict]) -> dict:
    """Apply an ES-style atomic action list. Each action is
    ``{"add": {"alias", "index", "filter"?, "boost"?,
    "is_write_index"?}}`` or ``{"remove": {"alias", "index"}}``.
    ALL-OR-NOTHING: any invalid action raises and the registry file is
    untouched. Returns the committed registry dict."""
    with write_lock(registry_dir, owner="aliases"):
        reg = copy.deepcopy(_load(registry_dir))
        for action in actions:
            if set(action) == {"add"}:
                entry = _validate_add(action["add"])
                rows = reg.setdefault(action["add"]["alias"], [])
                for i, r in enumerate(rows):
                    if r["index"] == entry["index"]:
                        rows[i] = entry  # ES: re-add updates in place
                        break
                else:
                    rows.append(entry)
            elif set(action) == {"remove"}:
                alias = action["remove"].get("alias")
                index = action["remove"].get("index")
                rows = reg.get(alias)
                if not rows:
                    raise ValueError(f"alias {alias!r} does not exist")
                key = os.path.realpath(index) if index else None
                kept = [r for r in rows if r["index"] != key]
                if len(kept) == len(rows):
                    raise ValueError(
                        f"alias {alias!r} does not point at {index!r}"
                    )
                if kept:
                    reg[alias] = kept
                else:
                    del reg[alias]  # last index removed -> alias gone
            else:
                raise ValueError(
                    f"action must be {{'add': ...}} or {{'remove': ...}}, "
                    f"got {sorted(action)!r}"
                )
        for alias, rows in reg.items():
            writers = [r for r in rows if r["is_write_index"]]
            if len(writers) > 1:
                raise ValueError(
                    f"alias {alias!r}: at most one index may set "
                    f"is_write_index (got {len(writers)})"
                )
        _save(registry_dir, reg)
        return reg


def get_aliases(registry_dir: str, name: str | None = None) -> dict:
    """The registry (or one alias's rows). Unknown name raises."""
    reg = _load(registry_dir)
    if name is None:
        return reg
    if name not in reg:
        raise ValueError(f"alias {name!r} does not exist")
    return {name: reg[name]}


def resolve_alias(registry_dir: str, name: str) -> dict:
    """-> {"dirs": [...], "filters": [...]|None, "boosts": [...]|None}
    in registration order — the search_multi argument shape (filters /
    boosts collapse to None when no entry sets one)."""
    rows = get_aliases(registry_dir, name)[name]
    filters = [r["filter"] for r in rows]
    boosts = [r["boost"] for r in rows]
    return {
        "dirs": [r["index"] for r in rows],
        "filters": filters if any(f is not None for f in filters) else None,
        "boosts": boosts if any(b is not None for b in boosts) else None,
    }


def write_index(registry_dir: str, name: str) -> str:
    """The ES write-routing rule: a single-index alias writes to its one
    index; multiple indexes need exactly one ``is_write_index=True``;
    none flagged = rejected (ES refuses writes to such aliases)."""
    rows = get_aliases(registry_dir, name)[name]
    if len(rows) == 1:
        return rows[0]["index"]
    writers = [r["index"] for r in rows if r["is_write_index"]]
    if len(writers) != 1:
        raise ValueError(
            f"alias {name!r} spans {len(rows)} indexes with "
            f"{len(writers)} write indexes — flag exactly one with "
            f"is_write_index to route writes"
        )
    return writers[0]


def alias_search(spark, registry_dir: str, name: str, query, **kwargs):
    """Search through a registered alias: resolves dirs + per-index
    filters + boosts and delegates to :func:`query.multi.search_multi`
    (alias-global stats, filter context, post-score boosts — all the
    already-gated multi-index machinery). Returns (results, count)."""
    from .query.multi import search_multi

    r = resolve_alias(registry_dir, name)
    return search_multi(
        spark, r["dirs"], query,
        alias_filters=r["filters"], index_boosts=r["boosts"], **kwargs,
    )
