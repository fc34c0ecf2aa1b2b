"""The driver's CORRECTNESS gate takes the FIRST 50 registry entries in
iteration order — round 3 lost all 36 pipeline queries past that cap to
a registration reshuffle (VERDICT r3, "What's wrong #1"). These asserts
pin the manifest so it can never happen silently again."""

from tsdb_spark.queries import GATE, QUERIES


def test_gate_is_exactly_the_first_50():
    assert len(GATE) == 50
    assert len(set(GATE)) == 50
    assert list(QUERIES)[:50] == list(GATE)


def test_gate_entries_all_have_oracles():
    # every gate slot must be a full hash-checked row, not a weaker
    # rows-only check
    missing = [n for n in GATE if QUERIES[n].oracle is None]
    assert not missing, missing


def test_gate_covers_every_family():
    fams = {
        "core": lambda n: n.startswith("tsdb_"),
        "promql": lambda n: n.startswith("promql_"),
        "api": lambda n: n.startswith("api_"),
        "store": lambda n: n.startswith("store_"),
        "stream": lambda n: n.startswith("stream_"),
        "docs": lambda n: n.startswith("docs_"),
        "emb": lambda n: n.startswith("emb_"),
        "mm": lambda n: n.startswith("mm_"),
    }
    for fam, pred in fams.items():
        assert any(pred(n) for n in GATE), f"no {fam} entry in gate"


def test_everything_past_the_gate_is_still_registered():
    # the long tail stays selfcheck-verified — nothing is dropped
    assert len(QUERIES) >= 90


def test_registry_names_match_their_functions():
    # every entry's spark_fn must be the function NAMED for it — a
    # misplaced helper between @register and its def silently rebinds
    # the entry to the wrong callable (bit twice in r6)
    mismatched = [
        (name, q.spark_fn.__name__)
        for name, q in QUERIES.items()
        if q.spark_fn.__name__ != name
    ]
    assert not mismatched, mismatched
