"""IP doc-value fields: equality, CIDR masks, ranges, exists, sort,
ip_range aggregation, percolation, merge/evolve/reindex carry-through.

EXTENSION — the reference has text fields only
(/root/reference/schema/schema.go:11-16); the ip field is the ES ``ip``
type / Lucene InetAddressPoint analog. ES stores every value as the
16-byte IPv6 form (IPv4 mapped into ::ffff:0:0/96) and compares bytes;
we store the same 16 bytes as a 32-hex string docmap column, so
lexicographic string order == numeric 128-bit order and the whole
keyword machinery runs ip queries verbatim (ostrich_spark/ip.py).
"""

import ipaddress

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.ip import (
    cidr_bounds,
    hex_to_ip,
    ip_hex,
    ip_hex_series,
    ip_range_spec,
    is_canonical,
)
from ostrich_spark.manifest import load_manifest
from ostrich_spark.query.exec import (
    attach_docmap,
    range_agg,
    search,
    search_sorted,
)
from ostrich_spark.query.parser import (
    FILTER,
    MUST,
    BooleanQuery,
    KeywordQuery,
    QueryParseError,
    RangeQuery,
    TermQuery,
    TermsQuery,
    parse_query,
)
from ostrich_spark.schema import Schema

# doc 6 carries the MAPPED form of doc 0's address — the same value by
# the ES encoding contract; doc 7 has no address.
DOCS = [
    (0, "alpha web", "10.0.0.1"),
    (1, "beta web", "10.0.0.2"),
    (2, "gamma db", "10.1.2.3"),
    (3, "delta db", "192.168.1.77"),
    (4, "epsilon cache", "9.0.0.0"),
    (5, "zeta cache", "2001:db8::1"),
    (6, "eta misc", "::ffff:10.0.0.1"),
    (7, "theta misc", None),
]


def _schema() -> Schema:
    s = Schema()
    # store=True so the reindex round-trip test can re-read the text
    s.add_text_field("text", "default", store=True)
    s.add_ip_field("ip")
    return s


@pytest.fixture(scope="module")
def ip_index(spark, tmp_path_factory):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, ip string")
    idx = str(tmp_path_factory.mktemp("ip") / "idx")
    build_index(
        spark, df, _schema(), idx, num_partitions=2,
        order_col="doc_id", id_cols=["doc_id"],
    )
    return idx


def _match_ids(spark, idx, q, **kw):
    res, _ = search(spark, idx, q, limit=None, **kw)
    return {r["doc_id"] for r in attach_docmap(spark, idx, res).collect()}


def _enc(v) -> int:
    """Independent reference encoding: the RFC 4291 IPv4-mapped 128-bit
    value (re-derived here from the stdlib, not from ip.py) — the byte
    space ES/Lucene compare in."""
    a = ipaddress.ip_address(v) if isinstance(v, str) else v
    return int(a) + (0xFFFF00000000 if a.version == 4 else 0)


def _brute(pred):
    """Expected ids from the raw fixture via the stdlib reference."""
    out = set()
    for doc_id, _, raw in DOCS:
        if raw is None:
            continue
        if pred(ipaddress.ip_address(raw)):
            out.add(doc_id)
    return out


def test_encode_goldens():
    h = ip_hex("1.2.3.4")
    assert h == "00000000000000000000ffff01020304"
    # mapped-v4 equivalence: one value, one encoding (the ES contract)
    assert ip_hex("::ffff:1.2.3.4") == h
    assert hex_to_ip(h) == "1.2.3.4"
    h6 = ip_hex("2001:db8::1")
    assert h6 == "20010db8000000000000000000000001"
    assert hex_to_ip(h6) == "2001:db8::1"
    # numeric order, not dotted-string order
    assert ip_hex("9.0.0.0") < ip_hex("10.0.0.0")
    # every v4 sorts below every v6 outside the mapped block
    assert ip_hex("255.255.255.255") < h6
    assert is_canonical(h) and not is_canonical("1.2.3.4")
    lo, hi = cidr_bounds("10.0.0.0/8")
    assert (lo, hi) == (ip_hex("10.0.0.0"), ip_hex("10.255.255.255"))
    # host bits tolerated (strict=False, the ES behavior)
    assert cidr_bounds("10.9.9.9/8") == (lo, hi)
    assert cidr_bounds("::/0") == ("0" * 32, "f" * 32)
    with pytest.raises(ValueError):
        ip_hex("not-an-ip")
    with pytest.raises(ValueError):
        ip_hex("10.0.0.256")


def test_ip_range_spec_buckets():
    key, lo, hi = ip_range_spec("priv", mask="10.0.0.0/8")
    assert lo == ip_hex("10.0.0.0")
    # exclusive hi of a mask bucket = broadcast + 1
    assert hi == ip_hex("11.0.0.0")
    # top of the address space has no successor -> open
    assert ip_range_spec("all", mask="::/0") == ("all", "0" * 32, None)
    assert ip_range_spec("w", from_="1.2.3.4", to="1.2.3.9") == (
        "w", ip_hex("1.2.3.4"), ip_hex("1.2.3.9"))
    with pytest.raises(ValueError, match="mutually exclusive"):
        ip_range_spec("bad", from_="1.2.3.4", mask="10.0.0.0/8")


def test_ip_hex_series_modes():
    import pandas as pd

    s = pd.Series(["1.2.3.4", None, "", " 9.8.7.6 ", "junk",
                   ip_hex("5.6.7.8")])
    got = ip_hex_series(s, errors="null").tolist()
    assert got == [ip_hex("1.2.3.4"), None, None, ip_hex("9.8.7.6"),
                   None, ip_hex("5.6.7.8")]
    with pytest.raises(ValueError, match="cannot parse 'junk'"):
        ip_hex_series(s, errors="raise", field_name="ip")


def test_queries_identity_with_stdlib_reference(spark, ip_index):
    # equality: dotted, mapped form, programmatic raw value — all the
    # same value; docs 0 AND 6 both match (they store one encoding —
    # the ES 16-byte contract, which the stdlib's own == does NOT have)
    eq = _brute(lambda a: _enc(a) == _enc("10.0.0.1"))
    assert eq == {0, 6}
    for q in ("ip:10.0.0.1", 'ip:"::ffff:10.0.0.1"'):
        assert _match_ids(spark, ip_index, q) == eq
    sch = load_manifest(ip_index).schema
    fid = sch.field_by_name("ip").id
    assert _match_ids(spark, ip_index, KeywordQuery(fid, "10.0.0.1")) == eq

    # CIDR masks at several widths, vs an independent encoded-interval
    # recount (a mask = [network, broadcast] in the 16-byte space; a v6
    # block covering the mapped range matches v4 values — ES behavior)
    for cidr in ("10.0.0.0/8", "10.0.0.0/24", "10.0.0.1/32",
                 "192.168.0.0/16", "0.0.0.0/0", "2001:db8::/32", "::/0"):
        net = ipaddress.ip_network(cidr)
        nlo, nhi = _enc(net.network_address), _enc(net.broadcast_address)
        exp = _brute(lambda a, lo=nlo, hi=nhi: lo <= _enc(a) <= hi)
        got = _match_ids(spark, ip_index, f"ip:{cidr}")
        assert got == exp, cidr
    # the two v4/v6 catch-alls differ exactly by the v6 doc
    assert _match_ids(spark, ip_index, "ip:::/0") - _match_ids(
        spark, ip_index, "ip:0.0.0.0/0") == {5}

    # explicit ranges: inclusive, exclusive, open bounds
    r = _match_ids(spark, ip_index, "ip:[10.0.0.1 TO 10.1.2.3]")
    assert r == _brute(
        lambda a: _enc("10.0.0.1") <= _enc(a) <= _enc("10.1.2.3")
    ) == {0, 1, 2, 6}
    assert _match_ids(spark, ip_index, "ip:{10.0.0.1 TO 10.1.2.3}") == {1}
    # open upper bound: everything at/above 192.0.0.0 in ENCODED order —
    # which includes every v6 value outside the mapped block
    lo192 = ip_hex("192.0.0.0")
    exp_open = {d for d, _, raw in DOCS
                if raw is not None and ip_hex(raw) >= lo192}
    assert exp_open == {3, 5}
    assert _match_ids(spark, ip_index, "ip:[192.0.0.0 TO *]") == exp_open
    # programmatic raw-literal range normalizes too
    assert _match_ids(
        spark, ip_index, RangeQuery(fid, "10.0.0.0", "10.255.255.255")
    ) == _match_ids(spark, ip_index, "ip:10.0.0.0/8")

    # exists + terms set (raw values normalize)
    assert _match_ids(spark, ip_index, "ip:*") == {0, 1, 2, 3, 4, 5, 6}
    assert _match_ids(
        spark, ip_index, TermsQuery(fid, ("9.0.0.0", "2001:db8::1"))
    ) == {4, 5}

    # FILTER composition beside scored text: membership narrows, the
    # text score is untouched
    base = {r["doc_id"]: r["score"] for r in attach_docmap(
        spark, ip_index, search(spark, ip_index, "text:web",
                                limit=None)[0]).collect()}
    q = BooleanQuery([(MUST, TermQuery(0, "web")),
                      (FILTER, parse_query("ip:10.0.0.0/8", sch))])
    got = {r["doc_id"]: r["score"] for r in attach_docmap(
        spark, ip_index, search(spark, ip_index, q, limit=None)[0]).collect()}
    assert set(got) == {0, 1} and all(got[d] == base[d] for d in got)


def test_sort_numeric_address_order(spark, ip_index):
    rows = search_sorted(spark, ip_index, "ip:*", "ip",
                         ascending=True, limit=None, tiebreak=["doc_id"])
    got = [hex_to_ip(r["ip"]) for r in rows.collect()]
    exp = [hex_to_ip(h) for h in
           sorted(ip_hex(raw) for _, _, raw in DOCS if raw is not None)]
    assert got == exp
    # dotted-lex order would put 10.* before 9.*; numeric order must not
    assert got.index("9.0.0.0") < got.index("10.0.0.1")


def test_ip_range_aggregation(spark, ip_index):
    ranges = [
        ip_range_spec("ten", mask="10.0.0.0/8"),
        ip_range_spec("low", from_=None, to="10.0.0.2"),
        ip_range_spec("v6", mask="2001:db8::/32"),
        ip_range_spec("empty", from_="172.16.0.0", to="172.17.0.0"),
    ]
    rows = {r["range_key"]: r["n_docs"]
            for r in range_agg(spark, ip_index, "ip:*", "ip", ranges).collect()}
    assert rows == {"ten": 4, "low": 3, "v6": 1, "empty": 0}
    # raw-literal bounds normalize inside range_agg too
    rows2 = {r["range_key"]: r["n_docs"] for r in range_agg(
        spark, ip_index, "ip:*", "ip",
        [("w", "10.0.0.1", "10.0.0.3")]).collect()}
    assert rows2 == {"w": 3}  # docs 0, 1, 6 (hi exclusive)


def test_percolation_identity(spark, ip_index):
    from ostrich_spark.percolate import percolate, register_queries

    sch = _schema()
    fid = sch.field_by_name("ip").id
    queries = {
        "ten_net": "ip:10.0.0.0/8",
        "exact": "ip:10.0.0.1",
        "pair": TermsQuery(fid, ("9.0.0.0", "2001:db8::1")),
        "db_in_ten": BooleanQuery([
            (MUST, TermQuery(0, "db")),
            (FILTER, parse_query("ip:10.0.0.0/8", sch)),
        ]),
        "has_ip": "ip:*",
    }
    pq = register_queries(queries, sch)
    stream = DOCS + [(8, "iota web", "totally-garbled")]
    docs = spark.createDataFrame(stream, "doc_id long, text string, ip string")
    got = {}
    for r in percolate(spark, docs, pq, sch, id_col="doc_id").collect():
        got.setdefault(r["query_id"], set()).add(r["doc_id"])
    for qid, q in queries.items():
        exp = _match_ids(spark, ip_index, q)
        # identity over the indexed docs; the garbled doc (8) must match
        # no ip subscription (tolerant-null doc-side encode)
        assert got.get(qid, set()) == exp, qid
    # subscription-side junk is LOUD, not tolerant
    with pytest.raises(ValueError, match="cannot parse"):
        register_queries({"bad": KeywordQuery(fid, "not-an-ip")}, sch)


def test_merge_evolve_reindex_carry(spark, tmp_path):
    from ostrich_spark.build import build_index as bi, reindex
    from ostrich_spark.manifest import add_field
    from ostrich_spark.merge import merge_segments

    df = spark.createDataFrame(DOCS, "doc_id long, text string, ip string")
    idx = str(tmp_path / "m")
    bi(spark, df, _schema(), idx, num_partitions=3, order_col="doc_id",
       id_cols=["doc_id"])
    before = _match_ids(spark, idx, "ip:10.0.0.0/8")
    m = load_manifest(idx)
    merge_segments(spark, idx, [s.segment_id for s in m.segments], "merged-0")
    assert _match_ids(spark, idx, "ip:10.0.0.0/8") == before == {0, 1, 2, 6}

    # evolve: add an ip field to a committed index, then query it
    add_field(idx, "src_ip", ip=True)
    sch2 = load_manifest(idx).schema
    assert sch2.field_by_name("src_ip").is_ip
    # no committed data for it yet: empty match set, never an error
    assert _match_ids(spark, idx, "src_ip:10.0.0.0/8") == set()

    # reindex: the stored canonical column round-trips (passthrough);
    # rebuild with the ORIGINAL schema (the evolved src_ip field holds
    # no data, so the extract carries no column for it)
    dest = str(tmp_path / "r")
    reindex(spark, idx, dest, _schema())
    assert _match_ids(spark, dest, "ip:10.0.0.0/8") == before
    assert _match_ids(spark, dest, "ip:2001:db8::/32") == {5}


def test_validation(spark, tmp_path):
    sch = _schema()
    with pytest.raises(QueryParseError, match="not an IPv4/IPv6"):
        parse_query("ip:garbage", sch)
    with pytest.raises(QueryParseError, match="not an IPv4/IPv6"):
        parse_query("ip:[junk TO 1.2.3.4]", sch)
    # numeric bounds on an ip field reject at execution
    df = spark.createDataFrame(DOCS[:2], "doc_id long, text string, ip string")
    idx = str(tmp_path / "v")
    build_index(spark, df, sch, idx, num_partitions=1,
                order_col="doc_id", id_cols=["doc_id"])
    fid = sch.field_by_name("ip").id
    with pytest.raises(ValueError, match="needs string bounds"):
        search(spark, idx, RangeQuery(fid, 1, 2), limit=None)
    # malformed build input is loud
    bad = spark.createDataFrame([(9, "x", "nope")],
                                "doc_id long, text string, ip string")
    with pytest.raises(Exception, match="cannot parse|PythonException"):
        build_index(spark, bad, _schema(), str(tmp_path / "b"),
                    num_partitions=1, order_col="doc_id",
                    id_cols=["doc_id"])
    # duplicate name guard
    s2 = Schema()
    s2.add_ip_field("ip")
    with pytest.raises(ValueError, match="duplicate"):
        s2.add_ip_field("ip")


def test_cli_ip_build_search_agg(tmp_path):
    """End-to-end CLI: build --ip-field, NQL CIDR search, agg --range
    with a KEY:CIDR mask bucket."""
    import subprocess
    import sys

    import pandas as pd

    corpus = str(tmp_path / "corpus.parquet")
    pd.DataFrame(
        [{"doc_id": d, "text": t, "ip": ip} for d, t, ip in DOCS]
    ).to_parquet(corpus)
    idx = str(tmp_path / "cli_idx")

    def run(*argv):
        return subprocess.run(
            [sys.executable, "-m", "ostrich_spark", *argv],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )

    out = run("build", corpus, "-p", idx, "--field", "text",
              "--ip-field", "ip", "--id-col", "doc_id", "--partitions", "2")
    assert out.returncode == 0, out.stderr[-2000:]

    out = run("search", "ip:10.0.0.0/8", "-p", idx, "-l", "10")
    assert out.returncode == 0, out.stderr[-2000:]
    # docs 0, 1, 2, 6 live in 10/8 — four `seg/doc score` hit lines
    hits = [l for l in out.stdout.splitlines()
            if l and not l.startswith("elapsed")]
    assert len(hits) == 4, out.stdout

    # KEY:CIDR mask-bucket form (v6 from/to carry colons — API only,
    # documented in the --ranges help)
    out = run("agg", "ip:*", "-p", idx, "--range", "ip",
              "--ranges", "ten:10.0.0.0/8")
    assert out.returncode == 0, out.stderr[-2000:]
    assert any(l.startswith("ten ") and l.endswith(" 4")
               for l in out.stdout.splitlines()), out.stdout

    # garbage NQL exits non-zero with a parse error
    out = run("search", "ip:junk", "-p", idx)
    assert out.returncode != 0


class TestIpPrefix:
    """ES ip_prefix aggregation analog (exec.ip_prefix_agg): network
    buckets vs the stdlib ipaddress reference."""

    def test_v4_buckets_vs_stdlib(self, spark, ip_index):
        from collections import Counter

        from ostrich_spark.query.exec import ip_prefix_agg
        from ostrich_spark.query.parser import AllQuery

        for plen in (8, 20, 24, 31, 32):
            expect = Counter()
            for doc_id, _, raw in DOCS:
                if raw is None:
                    continue
                a = ipaddress.ip_address(raw)
                if a.version == 6 and not getattr(a, "ipv4_mapped", None):
                    continue  # v4 view excludes pure v6
                v4 = a.ipv4_mapped if a.version == 6 else a
                net = ipaddress.ip_network(f"{v4}/{plen}", strict=False)
                expect[f"{net.network_address}/{plen}"] += 1
            got = {
                r["ip_prefix"]: r["n_docs"]
                for r in ip_prefix_agg(
                    spark, ip_index, AllQuery(), "ip", plen
                ).collect()
            }
            assert got == dict(expect), plen

    def test_v6_view_and_options(self, spark, ip_index):
        from ostrich_spark.query.exec import ip_prefix_agg
        from ostrich_spark.query.parser import AllQuery

        rows = ip_prefix_agg(
            spark, ip_index, AllQuery(), "ip", 16, is_ipv6=True
        ).collect()
        # v6 view buckets EVERY address (v4s in ::ffff space share one
        # /16? no — the top 16 bits of v4-mapped are 0000) plus 2001:*
        nets = {r["ip_prefix"]: r["n_docs"] for r in rows}
        assert any(k.startswith("2001") for k in nets)
        assert sum(nets.values()) == 7  # every non-NULL address
        # min_doc_count + metrics grammar
        rows = ip_prefix_agg(
            spark, ip_index, AllQuery(), "ip", 8, min_doc_count=3,
            metrics={"n_ids": ("count_distinct", "doc_id")},
        ).collect()
        assert len(rows) == 1 and rows[0]["ip_prefix"] == "10.0.0.0/8"
        assert rows[0]["n_docs"] == 4 and rows[0]["n_ids"] == 4
        import pytest

        with pytest.raises(ValueError, match="prefix_length"):
            ip_prefix_agg(spark, ip_index, AllQuery(), "ip", 33)
        with pytest.raises(ValueError, match="ip field"):
            ip_prefix_agg(spark, ip_index, AllQuery(), "text", 8)

    def test_cli_ip_prefix(self, ip_index):
        import subprocess
        import sys

        out = subprocess.run(
            [sys.executable, "-m", "ostrich_spark", "agg", "text:web",
             "-p", ip_index, "--ip-prefix", "ip", "--prefix-len", "24"],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )
        assert out.returncode == 0, out.stderr[-2000:]
        lines = [l for l in out.stdout.splitlines() if "/" in l]
        # docs 0,1 (10.0.0.x) match text:web -> one /24 bucket of 2
        assert lines == ["10.0.0.0/24 2"]
        bad = subprocess.run(
            [sys.executable, "-m", "ostrich_spark", "agg", "text:web",
             "-p", ip_index, "--ip-prefix", "text"],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )
        assert bad.returncode == 2 and "ip field" in bad.stderr
