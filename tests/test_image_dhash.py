"""Image dHash + near-dup pairs (multimodal.dhash_images /
image_neardup_pairs) over the REAL stdlib PNG codec.

Design under test:
- engine dhash == a python recompute (decode + integer luma + resize +
  adjacent-compare) over seeded synthetic PNGs;
- a lightly-edited copy lands within a few bits and pairs with its
  original; unrelated images don't pair at the threshold;
- corrupt payloads yield NULL hash + err (data, not job failure);
- pigeonhole/band validation.
"""

import numpy as np
import pytest

from ostrich_spark.imagecodec import decode_png_pixels, encode_png
from ostrich_spark.multimodal import dhash_images, dhash_py, image_neardup_pairs


def _imgs():
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    near = base.copy()
    near[:2, :2] = 0  # tiny edit
    other = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    grad = np.tile(
        np.arange(32, dtype=np.uint8)[None, :, None] * 8, (32, 1, 3)
    )
    return {
        0: encode_png(base),
        1: encode_png(near),
        2: encode_png(other),
        3: encode_png(grad),
        4: b"not a png at all",
    }


def test_dhash_vs_python_and_pairs(spark):
    imgs = _imgs()
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in imgs.items()],
        "item_id long, payload binary",
    )
    got = {r["item_id"]: r for r in dhash_images(df).collect()}
    for k in (0, 1, 2, 3):
        expect = dhash_py(decode_png_pixels(imgs[k]))
        assert got[k]["dhash"] == expect, k
        assert (got[k]["width"], got[k]["height"]) == (32, 32)
    assert got[4]["dhash"] is None and got[4]["err"]
    # gradient hash is fully deterministic: every row 0b11111111 pattern
    g = got[3]["dhash"]
    assert g == dhash_py(decode_png_pixels(imgs[3]))
    # near-dup pairing: (0,1) within threshold, others out
    ham01 = bin((got[0]["dhash"] ^ got[1]["dhash"]) & (2**64 - 1)).count("1")
    assert ham01 <= 6
    pairs = image_neardup_pairs(dhash_images(df), max_hamming=6)
    rows = {(r["a"], r["b"]): r["hamming"] for r in pairs.collect()}
    assert (0, 1) in rows and rows[(0, 1)] == ham01
    assert all({a, b} == {0, 1} for a, b in rows)


def test_validation(spark):
    df = spark.createDataFrame([(0, 1)], "item_id long, dhash long")
    with pytest.raises(ValueError, match="divide"):
        image_neardup_pairs(df, bands=7)
    with pytest.raises(ValueError, match="pigeonhole"):
        image_neardup_pairs(df, max_hamming=8, bands=8)


def test_dhash_unparsable_id_stays_observable(spark):
    """A row whose id fails int() coercion must carry err='unparsable id'
    even when the payload decodes fine — otherwise it is
    indistinguishable from a good row and silently vanishes in
    downstream joins on the id column."""
    imgs = _imgs()
    df = spark.createDataFrame(
        [("not-an-int", bytearray(imgs[0])), ("7", bytearray(imgs[0])),
         ("bad-id-bad-png", bytearray(b"nope"))],
        "item_id string, payload binary",
    )
    got = sorted(dhash_images(df).collect(),
                 key=lambda r: (r["item_id"] is None, r["item_id"] or 0))
    by_err = {(r["item_id"], r["err"] or "") for r in got}
    assert (7, "") in by_err  # coercible id, good decode: clean row
    # both bad-id rows keep err set; the decodable one still gets a hash
    bad = [r for r in got if r["item_id"] is None]
    assert len(bad) == 2
    assert all(r["err"] == "unparsable id" for r in bad)
    assert sorted((r["dhash"] is not None) for r in bad) == [False, True]
