"""repeated_spans — exact substring-span dedup (Lee et al. 2022
ExactSubstr analog at token granularity, dedup.repeated_spans).

Design under test:
- surviving token stream == a python brute force over the same rules
  (occurrence-counted shingles incl within-doc repeats, keeper =
  lexicographically smallest (id, pos), span union);
- keep_first leaves exactly one copy of the boilerplate; remove_all
  leaves none; short docs pass whole;
- partition invariance; validation.
"""

import re

import pytest

from ostrich_spark.dedup import repeated_spans

BOILER = "all rights reserved contact us for more details today friend"  # 10 tokens


def _docs():
    return [
        (0, f"alpha beta gamma {BOILER} delta epsilon"),
        (1, f"zeta eta {BOILER} theta"),
        # within-doc repeat: counts as two occurrences by itself
        (2, "one two three four five six seven eight nine ten "
            "one two three four five six seven eight nine ten tail"),
        (3, "too short to carry any shingle"),
        (4, "totally unique content that repeats nothing at all "
            "and keeps every single token present here"),
    ]


def _brute(k=10, min_df=2, policy="keep_first"):
    toks = {
        i: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
        for i, s in _docs()
    }
    occ = []
    for i, ts in toks.items():
        for p in range(len(ts) - k + 1):
            occ.append((i, p, " ".join(ts[p:p + k])))
    from collections import Counter, defaultdict

    cnt = Counter(sh for _, _, sh in occ)
    keeper = {}
    for i, p, sh in sorted(occ):
        if sh not in keeper:
            keeper[sh] = (i, p)
    exc = defaultdict(list)
    for i, p, sh in occ:
        if cnt[sh] >= min_df:
            if policy == "remove_all" or keeper[sh] != (i, p):
                exc[i].append(p)
    out = {}
    for i, ts in toks.items():
        mask = [False] * len(ts)
        for s in exc.get(i, []):
            for j in range(s, min(s + k, len(ts))):
                mask[j] = True
        kept = [t for t, m in zip(ts, mask) if not m]
        out[i] = (" ".join(kept), len(kept), len(ts) - len(kept))
    return out


@pytest.mark.parametrize("parts", [1, 3])
def test_keep_first_vs_brute(spark, parts):
    df = spark.createDataFrame(_docs(), "doc_id long, text string").repartition(parts)
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
        for r in repeated_spans(df).collect()
    }
    assert got == _brute()
    # the keeper doc (0) retains the boilerplate; doc 1 lost it
    assert BOILER in got[0][0]
    assert BOILER not in got[1][0]
    # within-doc repeat: first copy stays, second excised
    assert got[2][0].startswith("one two three")
    assert got[2][2] == 10
    # short + unique docs untouched
    assert got[3][2] == 0 and got[4][2] == 0


def test_remove_all_and_validation(spark):
    df = spark.createDataFrame(_docs(), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
        for r in repeated_spans(df, policy="remove_all").collect()
    }
    assert got == _brute(policy="remove_all")
    assert BOILER not in got[0][0] and BOILER not in got[1][0]
    with pytest.raises(ValueError, match="k must"):
        repeated_spans(df, k=1)
    with pytest.raises(ValueError, match="min_df"):
        repeated_spans(df, min_df=1)
    with pytest.raises(ValueError, match="policy"):
        repeated_spans(df, policy="drop")


def test_hashed_shingles_identical_on_fixture(spark):
    """hash_shingles=True (the 8-byte-key scale lever) produces the
    IDENTICAL result on the fixture — 64-bit xxhash collisions are
    absent at test scale, so any divergence is a logic bug."""
    df = spark.createDataFrame(_docs(), "doc_id long, text string")
    exact = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
        for r in repeated_spans(df).collect()
    }
    hashed = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
        for r in repeated_spans(df, hash_shingles=True).collect()
    }
    assert hashed == exact
