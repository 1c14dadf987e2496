"""Span grouping (E2) + triple assembly (E3) unit tests against the
reference edge cases listed in FIXTURES.md §3."""

from denrl_spark.operators.spans import (
    group_spans,
    merge_ent_dict,
    fold_instance,
    sentence_triples,
)


def g(tokens_str, tags):
    return group_spans(tokens_str.split(), tags)


def test_group_basic_and_multi_token():
    groups = g(
        "alice johnson lived in new york",
        ["B-PERSON", "I-PERSON", "O", "O", "B-LOC", "I-LOC"],
    )
    assert [x["word"] for x in groups] == ["alice johnson", "new york"]
    assert [x["entity_group"] for x in groups] == ["PERSON", "LOC"]
    assert groups[0]["index"] == [0, 1]


def test_adjacent_BB_spans_do_not_merge():
    # run_jointmodel.py:1343-1350 — both-B adjacency splits
    groups = g("paris lyon", ["B-LOC", "B-LOC"])
    assert len(groups) == 2


def test_I_without_B_adjacent_merges_only_same_type():
    groups = g("a b c", ["B-X", "I-Y", "I-X"])
    # I-Y: different type -> new group; I-X after I-Y: not adjacent to B-X group
    assert [x["entity_group"] for x in groups] == ["X", "Y", "X"]


def test_span_at_start_and_end():
    groups = g("x y z", ["B-A", "O", "B-B"])
    assert groups[0]["index"] == [0] and groups[-1]["index"] == [2]


def test_fold_no_query_span_gives_none_ent1():
    # reference run_jointmodel.py:870-874
    ent_dict = {}
    groups = g("a b rel", ["O", "O", "B-/r/x"])
    fold_instance(groups, 0, ent_dict)  # query at 0 has no span
    trips = merge_ent_dict(ent_dict)
    assert trips == [{"ent1": "", "ent1_tag": "None", "ent2": "rel", "ent2_tag": "/r/x"}]


def test_query_with_no_related_emits_none_relation():
    ins = [
        {
            "query_id": 0,
            "tokens": "bob went home".split(),
            "ner_tags": ["B-PERSON", "O", "O"],
        }
    ]
    assert sentence_triples(ins) == [
        {"ent1": "bob", "ent1_tag": "PERSON", "ent2": "", "ent2_tag": "None"}
    ]


def test_sentence_triples_two_instances():
    tokens = "alice johnson lived near new york".split()
    ins = [
        {
            "query_id": 0,
            "tokens": tokens,
            "ner_tags": ["B-PERSON", "I-PERSON", "O", "O", "B-/p/lived", "I-/p/lived"],
        },
        {
            "query_id": 4,
            "tokens": tokens,
            "ner_tags": ["B-PERSON", "I-PERSON", "O", "O", "B-LOCATION", "I-LOCATION"],
        },
    ]
    trips = sentence_triples(ins)
    assert {
        "ent1": "alice johnson",
        "ent1_tag": "PERSON",
        "ent2": "new york",
        "ent2_tag": "/p/lived",
    } in trips
    assert {
        "ent1": "new york",
        "ent1_tag": "LOCATION",
        "ent2": "alice johnson",
        "ent2_tag": "PERSON",
    } in trips
    assert len(trips) == 2


def test_duplicate_mentions_kept():
    # same tail span type appearing twice -> two triples (duplicates preserved)
    tokens = "bob saw paris then paris again".split()
    ins = [
        {
            "query_id": 0,
            "tokens": tokens,
            "ner_tags": ["B-PERSON", "O", "B-/r/c", "O", "B-/r/c", "O"],
        }
    ]
    trips = sentence_triples(ins)
    assert len(trips) == 2
    assert trips[0] == trips[1]
