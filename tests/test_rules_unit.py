"""Unit tests for the shared rule functions (mention grammar + URI
canonicalization) — the golden-rule fixtures from SURVEY.md §2.2."""

from glean_cetaf_rdfs_spark.functions import mentions as M
from glean_cetaf_rdfs_spark.functions.uri import (
    canonicalize_py,
    match_keys_py,
    url_domain_py,
)


def test_extract_urls_bare_and_bracket():
    text = 'see http://a.example/x see <http://dirty.example/a b/1> tail'
    assert M.extract_urls(text) == ["http://dirty.example/a b/1", "http://a.example/x"]


def test_extract_urls_stops_at_illegal_chars():
    assert M.extract_urls("x https://b.example/p]q") == ["https://b.example/p"]


def test_coords_rounding_rule():
    # ≥6 decimals → 5 dp (JACQ.sh:390-395); shorter passes through
    assert M.round_decimal_literal("1.2345678") == "1.23457"
    assert M.round_decimal_literal("1.234") == "1.234"
    assert M.extract_coords("lat=10.123456 long=-3.123") == [("10.12346", "-3.123")]


def test_collection_and_flags():
    assert M.extract_collection_codes('collection "TUR-A" x') == ["TUR-A"]
    assert M.has_empty_note('a note="" b')
    assert M.is_event_marked("x eventtype=Event")
    assert not M.is_event_marked("x eventtype=Eventual")


def test_canonicalize_port_strip():
    assert canonicalize_py("https://d.example:443/a") == "https://d.example/a"
    assert canonicalize_py("http://d.example:80/a") == "http://d.example/a"
    assert canonicalize_py("http://d.example:8080/a") == "http://d.example:8080/a"


def test_canonicalize_wikidata():
    for u in ("https://m.wikidata.org/wiki/Q7", "http://www.wikidata.org/wiki/Q7",
              "https://www.wikidata.org/entity/Q7"):
        assert canonicalize_py(u) == "http://www.wikidata.org/entity/Q7"


def test_canonicalize_viaf_and_scheme():
    assert canonicalize_py("http://viaf.org/viaf/12345/#entity") == "http://viaf.org/viaf/12345"
    assert canonicalize_py("http://viaf.org/viaf/12345/rdf.xml") == "http://viaf.org/viaf/12345"
    assert canonicalize_py("https://ipni.example/id/9") == "http://ipni.example/id/9"
    assert canonicalize_py("https://other.example/id/9") == "https://other.example/id/9"


def test_canonicalize_percent_encoding():
    assert canonicalize_py("http://d.example/a b/c^d") == "http://d.example/a%20b/c%5Ed"
    assert canonicalize_py("http://d.example/x[1]`\\") == "http://d.example/x%5B1%5D%60%5C"


def test_match_keys():
    assert match_keys_py("http://dr.herbaria.example/spec/5") == [
        "dr.herbaria.example",
        "dr.herbaria.example/spec",
        "dr.herbaria.example/spec/5",
    ]
    # port stripped from domain key; query segment stops key growth
    assert match_keys_py("http://tun.example:80/a?format=X") == ["tun.example"]
    assert url_domain_py("https://x.example:443/a") == "x.example"
