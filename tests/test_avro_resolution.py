"""Property tests for Avro schema resolution (avro_codec.decode_resolved):
identity (reader == writer) must equal plain decode for ANY value, and the
evolution rules (skip / default / promote / union re-resolve) must hold for
randomly generated records.  Driver-free — no Spark session."""

from __future__ import annotations

import io

from hypothesis import given, settings
from hypothesis import strategies as st

from go_pulsar_elasticsearch_spark.ingest import avro_codec as ac

_SETTINGS = settings(max_examples=100, deadline=None)

_TAG = {
    "type": "record",
    "name": "Tag",
    "fields": [
        {"name": "type", "type": "string"},
        {"name": "value", "type": "string"},
    ],
}

V1 = {
    "type": "record",
    "name": "R",
    "fields": [
        {"name": "identifier", "type": "string"},
        {"name": "name", "type": "string"},
        {"name": "count", "type": "int"},
        {"name": "ingestion_time", "type": "long"},
        {"name": "payload", "type": "bytes"},
        {"name": "tags", "type": ["null", {"type": "array", "items": _TAG}],
         "default": None},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
    ],
}

V2 = {
    "type": "record",
    "name": "R",
    "fields": [
        {"name": "identifier", "type": "string"},
        # `name` removed: skipped on the wire
        {"name": "count", "type": "long"},            # int -> long
        {"name": "ingestion_time", "type": "double"},  # long -> double
        {"name": "payload", "type": "string"},         # bytes -> string
        {"name": "tags", "type": ["null", {"type": "array", "items": _TAG}],
         "default": None},
        {"name": "attrs", "type": {"type": "map", "values": "double"}},
        {"name": "source", "type": "string", "default": "pulsar"},
        {"name": "priority", "type": ["null", "long"], "default": None},
    ],
}

_txt = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
    max_size=20,
)
_utf8_bytes = _txt.map(lambda s: s.encode("utf-8"))

_records = st.fixed_dictionaries(
    {
        "identifier": _txt,
        "name": _txt,
        "count": st.integers(-(2**31), 2**31 - 1),
        "ingestion_time": st.integers(-(2**53), 2**53),
        "payload": _utf8_bytes,
        "tags": st.one_of(
            st.none(),
            st.lists(
                st.fixed_dictionaries({"type": _txt, "value": _txt}),
                max_size=4,
            ),
        ),
        "attrs": st.dictionaries(_txt, st.integers(-(2**40), 2**40),
                                 max_size=4),
    }
)


@_SETTINGS
@given(_records)
def test_identity_resolution_equals_plain_decode(rec):
    b = ac.encode(V1, rec)
    assert ac.decode_resolved(V1, V1, b) == ac.decode(V1, b)


@_SETTINGS
@given(_records)
def test_evolution_rules_hold(rec):
    b = ac.encode(V1, rec)
    buf = io.BytesIO(b)
    out = ac.decode_resolved(V1, V2, buf)
    # the resolved decode must consume the datum EXACTLY (skipped fields
    # included) — trailing-byte strictness is what routes framing bugs
    # to the DLQ
    assert buf.read(1) == b""
    assert "name" not in out
    assert out["identifier"] == rec["identifier"]
    assert out["count"] == rec["count"]
    assert isinstance(out["ingestion_time"], float)
    assert out["ingestion_time"] == float(rec["ingestion_time"])
    assert out["payload"] == rec["payload"].decode("utf-8")
    assert out["tags"] == rec["tags"]
    assert out["attrs"] == {k: float(v) for k, v in rec["attrs"].items()}
    assert out["source"] == "pulsar"
    assert out["priority"] is None


@_SETTINGS
@given(_records)
def test_v2_writer_decodes_under_v2(rec):
    """Forward direction sanity: once producers move to v2, the same
    reader keeps working (no resolution in play)."""
    rec2 = dict(rec)
    del rec2["name"]
    rec2["ingestion_time"] = float(rec2["ingestion_time"])
    rec2["payload"] = rec2["payload"].decode("utf-8")
    rec2["count"] = int(rec2["count"])
    rec2["attrs"] = {k: float(v) for k, v in rec2["attrs"].items()}
    rec2["source"] = "s3"
    rec2["priority"] = 3
    b = ac.encode(V2, rec2)
    assert ac.decode_resolved(V2, V2, b) == rec2


def test_missing_default_raises():
    v3 = {"type": "record", "name": "R",
          "fields": [{"name": "brand_new", "type": "string"}]}
    b = ac.encode(V1, {
        "identifier": "a", "name": "b", "count": 1, "ingestion_time": 2,
        "payload": b"x", "tags": None, "attrs": {},
    })
    try:
        ac.decode_resolved(V1, v3, b)
    except ValueError as exc:
        assert "brand_new" in str(exc)
    else:
        raise AssertionError("expected ValueError for missing default")


def test_illegal_demotion_raises():
    try:
        ac.decode_resolved("long", "int", ac.encode("long", 5))
    except ValueError:
        pass
    else:
        raise AssertionError("long -> int must not resolve")


def test_union_branch_selection_matches_record_names():
    """Round-5 review finding: a reader union of two record branches
    must bind the branch whose (unqualified) NAME matches the writer
    record, not the first record branch — otherwise the value is
    fabricated entirely from the wrong branch's defaults."""
    tag = {"type": "record", "name": "Tag", "fields": [
        {"name": "type", "type": "string"},
        {"name": "value", "type": "string"},
    ]}
    audit = {"type": "record", "name": "Audit", "fields": [
        {"name": "actor", "type": "string", "default": "x"},
        {"name": "note", "type": "string", "default": ""},
    ]}
    writer = {"type": "record", "name": "R", "fields": [
        {"name": "item", "type": tag},
    ]}
    reader = {"type": "record", "name": "R", "fields": [
        {"name": "item", "type": [audit, tag]},
    ]}
    b = ac.encode(writer, {"item": {"type": "k", "value": "v"}})
    out = ac.decode_resolved(writer, reader, b)
    assert out == {"item": {"type": "k", "value": "v"}}


def test_record_name_mismatch_raises():
    w = {"type": "record", "name": "A",
         "fields": [{"name": "x", "type": "long"}]}
    r = {"type": "record", "name": "B",
         "fields": [{"name": "x", "type": "long"}]}
    try:
        ac.decode_resolved(w, r, ac.encode(w, {"x": 1}))
    except ValueError as exc:
        assert "name mismatch" in str(exc)
    else:
        raise AssertionError("differently-named records must not resolve")


def test_qualified_names_match_unqualified():
    w = {"type": "record", "name": "com.example.R",
         "fields": [{"name": "x", "type": "int"}]}
    r = {"type": "record", "name": "other.ns.R",
         "fields": [{"name": "x", "type": "long"}]}
    assert ac.decode_resolved(w, r, ac.encode(w, {"x": 7})) == {"x": 7}
