"""Index schema — fixed, explicit, append-only.

Mirrors /root/reference/schema/schema.go:3-16 and
/root/reference/schema/fieldentry.go:3-8: an ordered list of field
entries; FieldID is the list index; only text fields exist
(/root/reference/schema/fieldtype.go:5-7). The schema round-trips through
the index manifest like ostrich's meta.json
(/root/reference/index/index_meta.go:103-126).
"""

from __future__ import annotations

from dataclasses import dataclass, field


FIELD_TYPE_TEXT = "text"
# EXTENSION (Lucene points / doc-values analog; the reference has only
# text fields, /root/reference/schema/fieldtype.go:5-7): numeric fields
# are NOT tokenized and produce no postings — the typed value rides the
# docmap (parquet column), where min/max row-group statistics give range
# queries the same pushdown pruning Lucene gets from its BKD points.
FIELD_TYPE_LONG = "long"
FIELD_TYPE_DOUBLE = "double"
NUMERIC_FIELD_TYPES = (FIELD_TYPE_LONG, FIELD_TYPE_DOUBLE)
# keyword doc-value field (EXTENSION, Elasticsearch `keyword` / Lucene
# StringField+SortedDocValues analog): the raw string is stored as a typed
# docmap column — never analyzed, no postings — and queried with exact
# equality (`lang:fr`) or existence (`lang:*`) filters.
FIELD_TYPE_KEYWORD = "keyword"
# date doc-value field (EXTENSION, the Elasticsearch `date` type).
# Lucene/ES store dates as LONGS (epoch millis in points + doc values);
# we do the same one level finer: the docmap column is int64 EPOCH
# MICROSECONDS, UTC (Spark/parquet timestamp precision). Everything
# downstream — range pruning via parquet int min/max stats, sorted
# search with early termination, the percolator's interval join — is
# the numeric machinery verbatim; only the query-side bound PARSING
# (ISO-8601 strings with ES-style unit rounding) and the calendar
# histogram are date-specific. Timestamp inputs convert JVM-side with
# unix_micros (an instant function — correct whatever the session
# timezone); naive inputs (TIMESTAMP_NTZ, strings, DATE) are read as
# UTC wall clock.
FIELD_TYPE_DATE = "date"
# geo-point doc-value field (EXTENSION, the Elasticsearch `geo_point` /
# Lucene LatLonPoint+LatLonDocValues analog). The docmap stores TWO
# float64 columns, `{name}__lat` and `{name}__lon` (both NULL when the
# doc has no point) — plain numeric columns, so parquet min/max stats
# prune bounding-box scans per row group exactly like numeric ranges.
# Build input is the ES-canonical "lat,lon" string (double→string→double
# round-trips exactly: Spark casts doubles with shortest-repr). Queried
# with GeoDistanceQuery / GeoBoundingBoxQuery (filter context, constant
# score, composable in boolean trees) and aggregated with geohash_grid /
# geotile_grid (ostrich_spark/geo.py). No query_string syntax — same as
# ES, whose geo queries exist only in the JSON DSL, never in
# query_string.
FIELD_TYPE_GEO = "geo_point"
# ip doc-value field (EXTENSION, the Elasticsearch `ip` type / Lucene
# InetAddressPoint analog). ES stores every ip as a 16-byte IPv6 value
# (IPv4 mapped into ::ffff:0:0/96) and compares the bytes; we store the
# SAME 16 bytes as a 32-char lowercase hex STRING docmap column —
# lexicographic order over fixed-width hex == numeric order over the
# 128-bit value, so equality, IN sets, CIDR masks (a [lo,hi] hex range),
# explicit ranges, exists, sorting and percolation all ride the KEYWORD
# string machinery verbatim (parquet string min/max stats prune range
# scans). Encoding happens only at the edges (ostrich_spark/ip.py):
# build input, query parse (`ip:10.0.0.0/8` in NQL), percolation ingest.
FIELD_TYPE_IP = "ip"
# geo-shape doc-value field (EXTENSION, the Elasticsearch `geo_shape` /
# Lucene LatLonShape analog, POLYGON subset). Where Lucene tessellates
# shapes into BKD triangles, we store the Spark-native equivalent of
# the same filter-then-verify strategy: FOUR float64 bounding-box
# columns `{name}__smin_lat/__smax_lat/__smin_lon/__smax_lon` (plain
# numeric columns — parquet min/max row-group stats prune every shape
# query's candidate scan, the BKD-filter analog) plus the ring itself
# as TWO array<double> columns `{name}__ring_lats/__ring_lons` read
# only by the exact Arrow-vectorized verify over the pruned candidates.
# v1 scope: one simple linear ring per doc (no holes/multipolygon),
# planar, dateline-crossing rejected at build (the Lucene split-them
# guidance); queried with GeoShapeQuery (point-intersects, and
# bbox intersects/within/disjoint) in filter context. DSL-only like
# every geo query; only `field:*` (exists) has NQL form.
FIELD_TYPE_SHAPE = "geo_shape"
# range doc-value field (EXTENSION, the Elasticsearch `integer_range` /
# `long_range` / `double_range` family / Lucene RangeField analog):
# each DOC carries an INTERVAL [lo, hi] — "valid 2019-2023", "supports
# ports 1024-2048" — and queries relate an interval against it
# (intersects / within / contains, all bounds inclusive, the ES
# relation semantics). Where Lucene encodes ranges into BKD dimensions,
# we store the Spark-native equivalent: TWO typed docmap columns
# `{name}__rlo` / `{name}__rhi` (both NULL = no range) — plain numeric
# columns, so parquet min/max row-group stats prune every relation's
# scan (an intersects query reads only row groups whose [min(lo),
# max(hi)] spans touch the query interval). Queried with
# RangeFieldQuery (filter context, constant score, composable in
# boolean trees); DSL-only besides `field:*` exists — the geo stance.
FIELD_TYPE_LONG_RANGE = "long_range"
FIELD_TYPE_DOUBLE_RANGE = "double_range"
RANGE_FIELD_TYPES = (FIELD_TYPE_LONG_RANGE, FIELD_TYPE_DOUBLE_RANGE)
# histogram doc-value field (EXTENSION, the Elasticsearch `histogram`
# type): each DOC carries a PRE-AGGREGATED value distribution — paired
# arrays values[] (strictly ascending, the ES requirement) and
# counts[] (>= 0) — the shape metrics pipelines (HDR/T-Digest rollups,
# Prometheus-style latency buckets) ship instead of raw samples.
# Stored as two array docmap columns `{name}__hvals` (array<double>) /
# `{name}__hcounts` (array<long>); aggregated with
# histogram_field_stats / histogram_field_percentiles, which weight
# every value by its count (the ES agg behavior). Not searchable
# beyond `field:*` exists (the ES contract: histogram fields support
# aggregations only), never sortable/facetable.
FIELD_TYPE_HISTOGRAM = "histogram"


def hist_vals_col(name: str) -> str:
    return f"{name}__hvals"


def hist_counts_col(name: str) -> str:
    return f"{name}__hcounts"


def range_lo_col(name: str) -> str:
    """Docmap column holding a range field's inclusive lower bound."""
    return f"{name}__rlo"


def range_hi_col(name: str) -> str:
    """Docmap column holding a range field's inclusive upper bound."""
    return f"{name}__rhi"


def shape_minlat_col(name: str) -> str:
    return f"{name}__smin_lat"


def shape_maxlat_col(name: str) -> str:
    return f"{name}__smax_lat"


def shape_minlon_col(name: str) -> str:
    return f"{name}__smin_lon"


def shape_maxlon_col(name: str) -> str:
    return f"{name}__smax_lon"


def shape_lats_col(name: str) -> str:
    return f"{name}__ring_lats"


def shape_lons_col(name: str) -> str:
    return f"{name}__ring_lons"


def geo_lat_col(name: str) -> str:
    """Docmap column holding a geo field's latitude (float64 degrees)."""
    return f"{name}__lat"


def geo_lon_col(name: str) -> str:
    """Docmap column holding a geo field's longitude (float64 degrees)."""
    return f"{name}__lon"


@dataclass(frozen=True)
class FieldEntry:
    id: int
    name: str
    field_type: str = FIELD_TYPE_TEXT
    analyzer: str = "default"
    # store token positions in the postings (enables phrase queries; an
    # extension — the reference's tokens carry no offsets/positions,
    # /root/reference/analyzer/analyzer.go:44-46)
    positions: bool = False
    # store the raw field value in the docmap (enables retrieval /
    # snippet highlighting; the reference's StoreWriter is a stub,
    # /root/reference/internal/store/writer.go:21-33)
    store: bool = False
    # analyzer for QUERY text against this field; "" = same as the index
    # analyzer (the normal case). EXTENSION (Elasticsearch
    # search_analyzer analog): index-time-expanding analyzers (edge
    # n-grams for search-as-you-type) must NOT expand the query term —
    # "spar" should look up the single gram "spar", not every prefix of
    # it.
    search_analyzer: str = ""
    # input column this field reads at build time; "" = the field's own
    # name (the normal case). EXTENSION (Elasticsearch multi-fields /
    # ``fields: {raw: keyword}`` analog): several schema fields may index
    # ONE source column differently — ``title`` text + ``title.raw``
    # keyword, or two analyzers — without duplicating the input data.
    # Docmap/doc-value columns are still keyed by the FIELD name.
    source_col: str = ""
    # EXTENSION (Elasticsearch ``copy_to`` mapping): names of OTHER text
    # fields that also index this field's RAW value (pre-analysis — the
    # target re-analyzes with its OWN analyzer, the ES contract). The
    # classic use: a catch-all field searched by default while the
    # sources keep per-field scoring. Copies do NOT chain (A→B where B
    # has copy_to C never reaches C — the documented ES non-recursion),
    # and the copied value does NOT enter content_sha256 twice (the
    # per-row content invariant hashes each field's OWN value only).
    copy_to: tuple = ()

    @property
    def input_col(self) -> str:
        """Input-table column this field reads at build time."""
        return self.source_col or self.name

    @property
    def is_numeric(self) -> bool:
        return self.field_type in NUMERIC_FIELD_TYPES

    @property
    def is_keyword(self) -> bool:
        return self.field_type == FIELD_TYPE_KEYWORD

    @property
    def is_date(self) -> bool:
        return self.field_type == FIELD_TYPE_DATE

    @property
    def is_geo(self) -> bool:
        return self.field_type == FIELD_TYPE_GEO

    @property
    def is_ip(self) -> bool:
        return self.field_type == FIELD_TYPE_IP

    @property
    def is_shape(self) -> bool:
        return self.field_type == FIELD_TYPE_SHAPE

    @property
    def is_range(self) -> bool:
        return self.field_type in RANGE_FIELD_TYPES

    @property
    def is_histogram(self) -> bool:
        return self.field_type == FIELD_TYPE_HISTOGRAM

    @property
    def is_doc_value(self) -> bool:
        """Doc-value-only field (numeric, keyword, date, geo, ip,
        shape or range): no analyzer, no postings, no norms — the typed
        value lives in the docmap (geo as the `__lat`/`__lon` column
        pair, shapes as 4 bbox columns + 2 ring arrays, ranges as the
        `__rlo`/`__rhi` bound pair)."""
        return (self.is_numeric or self.is_keyword or self.is_date
                or self.is_geo or self.is_ip or self.is_shape
                or self.is_range or self.is_histogram)

    @property
    def query_analyzer(self) -> str:
        """Analyzer NAME to apply to query text for this field."""
        return self.search_analyzer or self.analyzer

    def to_json(self) -> dict:
        return {
            "id": self.id,
            "name": self.name,
            "type": self.field_type,
            "analyzer": self.analyzer,
            "positions": self.positions,
            "store": self.store,
            "search_analyzer": self.search_analyzer,
            "source_col": self.source_col,
            "copy_to": list(self.copy_to),
        }

    @staticmethod
    def from_json(d: dict) -> "FieldEntry":
        return FieldEntry(
            d["id"],
            d["name"],
            d.get("type", FIELD_TYPE_TEXT),
            d.get("analyzer", "default"),
            d.get("positions", False),
            d.get("store", False),
            d.get("search_analyzer", ""),
            d.get("source_col", ""),
            tuple(d.get("copy_to", ())),
        )


@dataclass
class Schema:
    fields: list[FieldEntry] = field(default_factory=list)

    def add_text_field(
        self,
        name: str,
        analyzer: str = "default",
        positions: bool = False,
        store: bool = False,
        search_analyzer: str = "",
        source_col: str = "",
        copy_to=(),
    ) -> FieldEntry:
        """FieldID = position, exactly like schema.go:11-16.
        ``source_col`` reads another input column (ES multi-fields);
        ``copy_to`` lists other TEXT fields that also index this field's
        raw value (ES copy_to — validated at build time, when every
        target has been declared)."""
        self._check_name(name)
        entry = FieldEntry(
            len(self.fields), name, FIELD_TYPE_TEXT, analyzer, positions,
            store, search_analyzer, source_col,
            tuple([copy_to] if isinstance(copy_to, str) else copy_to),
        )
        self.fields.append(entry)
        return entry

    def validate_copy_to(self) -> None:
        """Build-time copy_to validation (targets may be declared after
        their sources, so add-time checking would force an ordering)."""
        for fe in self.fields:
            if not fe.copy_to:
                continue
            if fe.is_doc_value:
                raise ValueError(
                    f"copy_to on {fe.name!r}: only TEXT fields copy "
                    f"(doc-value fields have no token stream)"
                )
            for t in fe.copy_to:
                te = self.field_by_name(t)
                if te is None:
                    raise ValueError(
                        f"copy_to target {t!r} of field {fe.name!r} is "
                        f"not declared in this schema"
                    )
                if te.is_doc_value:
                    raise ValueError(
                        f"copy_to target {t!r} of field {fe.name!r} must "
                        f"be a text field"
                    )
                if te.name == fe.name:
                    raise ValueError(f"field {fe.name!r} cannot copy_to itself")

    def _check_name(self, name: str) -> None:
        if self.field_by_name(name) is not None:
            raise ValueError(
                f"duplicate field name {name!r} — FieldID is positional "
                f"and names address queries; to index one column twice "
                f"use distinct names with source_col (ES multi-fields)"
            )
        if "." in name:
            raise ValueError(
                f"field name {name!r} contains '.' — Spark reads dotted "
                f"column names as struct access; use '_' (e.g. title_raw)"
            )

    def add_numeric_field(
        self, name: str, numeric_type: str = FIELD_TYPE_LONG
    ) -> FieldEntry:
        """Numeric doc-value field (EXTENSION, see NUMERIC_FIELD_TYPES):
        no analyzer, no postings; the typed value is stored in the docmap
        and queried with RangeQuery (``field:[lo TO hi]``)."""
        if numeric_type not in NUMERIC_FIELD_TYPES:
            raise ValueError(f"numeric_type must be one of {NUMERIC_FIELD_TYPES}")
        self._check_name(name)
        entry = FieldEntry(len(self.fields), name, numeric_type, "", False, False)
        self.fields.append(entry)
        return entry

    def add_keyword_field(
        self, name: str, lowercase: bool = False, source_col: str = ""
    ) -> FieldEntry:
        """Keyword doc-value field (EXTENSION, the ES ``keyword`` type):
        no analyzer, no postings; the raw string is stored in the docmap
        (dictionary-encoded parquet — min/max row-group stats prune
        equality reads) and queried with KeywordQuery (``field:value``,
        exact match) or ExistsQuery (``field:*``).

        ``lowercase=True`` attaches the ES ``normalizer`` analog: values
        lowercase at index time AND query values lowercase before the
        equality, so ``lang:FR`` matches a stored ``fr`` (simple case
        mapping — the same ``str.lower`` on both sides). Stored docmap
        values are the NORMALIZED form, like ES keyword doc values.

        ``source_col`` reads another input column — the ES
        ``title.raw``-style keyword multi-field over a text column."""
        self._check_name(name)
        entry = FieldEntry(
            len(self.fields), name, FIELD_TYPE_KEYWORD,
            "lowercase" if lowercase else "", False, False, "", source_col,
        )
        self.fields.append(entry)
        return entry

    def add_date_field(self, name: str, source_col: str = "") -> FieldEntry:
        """Date doc-value field (EXTENSION, the ES ``date`` type; see
        FIELD_TYPE_DATE): no analyzer, no postings; the value is stored
        in the docmap as int64 epoch MICROSECONDS (UTC) and queried with
        RangeQuery carrying ISO-8601 bounds (``ts:[2024-01-10 TO
        2024-01-19]`` — partial dates round per unit like ES date math:
        an inclusive upper day bound means "through the end of that
        day"), ExistsQuery, sorted search, and ``date_histogram``.

        Accepted input columns at build: timestamp (converted with
        ``unix_micros`` — instant-correct under any session timezone),
        timestamp_ntz / string / date (read as UTC wall clock), or long
        (already epoch micros — the pass-through reindex/export shape).

        ``source_col`` reads another input column (ES multi-fields)."""
        self._check_name(name)
        entry = FieldEntry(
            len(self.fields), name, FIELD_TYPE_DATE, "", False, False,
            "", source_col,
        )
        self.fields.append(entry)
        return entry

    def add_geo_field(self, name: str, source_col: str = "") -> FieldEntry:
        """Geo-point doc-value field (EXTENSION, the ES ``geo_point``
        type; see FIELD_TYPE_GEO): no analyzer, no postings; the point is
        stored in the docmap as two float64 columns ``{name}__lat`` /
        ``{name}__lon`` and queried with GeoDistanceQuery /
        GeoBoundingBoxQuery (filter context), ExistsQuery, and the
        geohash_grid / geotile_grid aggregations (ostrich_spark/geo.py).

        Build input: the ES-canonical ``"lat,lon"`` string (NULL/empty =
        no point; lat must be in [-90, 90], lon in [-180, 180] — build
        raises on malformed or out-of-range values, it never silently
        wraps).

        ``source_col`` reads another input column (ES multi-fields)."""
        self._check_name(name)
        entry = FieldEntry(
            len(self.fields), name, FIELD_TYPE_GEO, "", False, False,
            "", source_col,
        )
        self.fields.append(entry)
        return entry

    def add_ip_field(self, name: str, source_col: str = "") -> FieldEntry:
        """IP doc-value field (EXTENSION, the ES ``ip`` type; see
        FIELD_TYPE_IP): no analyzer, no postings; the value is stored in
        the docmap as the canonical 32-hex encoding of the 16-byte IPv6
        form (IPv4 mapped — ``1.2.3.4`` ≡ ``::ffff:1.2.3.4``) and
        queried with ``ip:1.2.3.4`` (equality), ``ip:10.0.0.0/8`` (CIDR
        mask), ``ip:[10.0.0.1 TO 10.0.0.99]`` (range), ``ip:*``
        (exists), TermsQuery sets, sorted search (numeric address
        order), facets and the ``ip_range`` aggregation.

        Build input: IPv4/IPv6 string literals (NULL/empty = no value;
        malformed values raise — a silently dropped address is a corrupt
        index) or already-canonical hex (the reindex shape).

        ``source_col`` reads another input column (ES multi-fields)."""
        self._check_name(name)
        entry = FieldEntry(
            len(self.fields), name, FIELD_TYPE_IP, "", False, False,
            "", source_col,
        )
        self.fields.append(entry)
        return entry

    def add_range_field(
        self, name: str, range_type: str = FIELD_TYPE_LONG_RANGE,
        source_col: str = "",
    ) -> FieldEntry:
        """Range doc-value field (EXTENSION, the ES ``long_range`` /
        ``double_range`` family; see RANGE_FIELD_TYPES): each doc
        carries an inclusive interval [lo, hi] stored as two typed
        docmap columns (``{name}__rlo`` / ``{name}__rhi`` — parquet
        min/max stats prune every relation scan, the Lucene RangeField
        BKD analog).

        Build input: ``"lo,hi"`` strings (whitespace tolerated;
        NULL/empty = no range; a single value ``"v"`` is the point
        range [v, v], the ES singleton shape; lo > hi raises — a
        silently swapped interval is a corrupt index). Queried with
        RangeFieldQuery (relation intersects/within/contains, filter
        context) and ExistsQuery.

        ``source_col`` reads another input column (ES multi-fields)."""
        if range_type not in RANGE_FIELD_TYPES:
            raise ValueError(
                f"range_type must be one of {RANGE_FIELD_TYPES}"
            )
        self._check_name(name)
        entry = FieldEntry(
            len(self.fields), name, range_type, "", False, False,
            "", source_col,
        )
        self.fields.append(entry)
        return entry

    def add_histogram_field(self, name: str, source_col: str = "") -> FieldEntry:
        """Histogram doc-value field (EXTENSION, the ES ``histogram``
        type; see FIELD_TYPE_HISTOGRAM): a pre-aggregated value
        distribution per doc, stored as paired array docmap columns.

        Build input: ``"v:c;v:c;..."`` strings (value:count pairs,
        values strictly ascending — the ES requirement — counts >= 0
        integers; NULL/empty = no histogram; malformed raises).
        Aggregations only (histogram_field_stats /
        histogram_field_percentiles) plus ``field:*`` exists — the ES
        contract; histogram fields never search, sort or facet.

        ``source_col`` reads another input column (ES multi-fields)."""
        self._check_name(name)
        entry = FieldEntry(
            len(self.fields), name, FIELD_TYPE_HISTOGRAM, "", False, False,
            "", source_col,
        )
        self.fields.append(entry)
        return entry

    def add_shape_field(self, name: str, source_col: str = "") -> FieldEntry:
        """Geo-shape doc-value field (EXTENSION, the ES ``geo_shape``
        type, POLYGON subset; see FIELD_TYPE_SHAPE): the ring is stored
        as two array<double> docmap columns plus four bbox float
        columns that prune every query via parquet min/max stats —
        the filter-then-verify strategy Lucene's BKD tree implements.

        Build input: ``"lat,lon;lat,lon;..."`` ring strings (>= 3
        distinct vertices, GeoJSON closed form accepted, NULL/empty =
        no shape; malformed, out-of-range or dateline-spanning rings
        raise). Queried with GeoShapeQuery (filter context), ExistsQuery.

        ``source_col`` reads another input column (ES multi-fields)."""
        self._check_name(name)
        entry = FieldEntry(
            len(self.fields), name, FIELD_TYPE_SHAPE, "", False, False,
            "", source_col,
        )
        self.fields.append(entry)
        return entry

    def extends(self, prior: "Schema") -> bool:
        """True when this schema is an append-only extension of ``prior``:
        every prior field appears IDENTICALLY (same id/name/type/analyzer/
        flags) at the same position, optionally followed by new fields.
        FieldID is positional, so anything else (reorder, retype, rename)
        silently re-addresses existing postings — the one unrecoverable
        schema mistake; build append and add_field enforce this."""
        if len(self.fields) < len(prior.fields):
            return False
        return all(a == b for a, b in zip(self.fields, prior.fields))

    def field_by_name(self, name: str) -> FieldEntry | None:
        for f in self.fields:
            if f.name == name:
                return f
        return None

    def field_by_id(self, fid: int) -> FieldEntry:
        return self.fields[fid]

    @property
    def field_names(self) -> list[str]:
        return [f.name for f in self.fields]

    def to_json(self) -> list[dict]:
        return [f.to_json() for f in self.fields]

    @staticmethod
    def from_json(items: list[dict]) -> "Schema":
        return Schema([FieldEntry.from_json(d) for d in items])
