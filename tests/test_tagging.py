"""Corpus + distant-supervision tagging tests (SURVEY.md §5 items 1-2)."""

from pyspark.sql import functions as F

from denrl_spark.operators.tagging import (
    build_instances,
    find_entity_spans,
    instances_for_turn,
    tag_instance,
    tokenize,
)
from denrl_spark.sources.corpus import make_turn_text, n_turns_for, transcripts
from denrl_spark.sources.kb import KB

KBD = KB.default()


def test_tokenize_round_trip_pure():
    for conv in range(50):
        for turn in range(min(3, n_turns_for(42, conv))):
            text = make_turn_text(42, conv, turn)
            assert " ".join(tokenize(text)) == text


def test_greedy_longest_match():
    toks = tokenize("the alice johnson met new york and paris")
    spans = find_entity_spans(toks, KBD)
    assert spans == [
        (1, 3, "alice johnson", "PERSON"),
        (4, 6, "new york", "LOCATION"),
        (7, 8, "paris", "LOCATION"),
    ]


def test_tag_semantics_query_vs_tail():
    # "alice johnson lived new york" : query=alice -> tail gets relation tag;
    # query=new york -> alice keeps its entity tag (no KB edge ny->alice).
    toks = tokenize("alice johnson lived near new york today")
    spans = find_entity_spans(toks, KBD)
    q_alice, q_ny = spans[0], spans[1]
    tags_alice = tag_instance(toks, spans, q_alice, KBD)
    assert tags_alice[0:2] == ["B-PERSON", "I-PERSON"]
    assert tags_alice[4] == "B-/people/person/place_lived"
    assert tags_alice[5] == "I-/people/person/place_lived"
    tags_ny = tag_instance(toks, spans, q_ny, KBD)
    assert tags_ny[4:6] == ["B-LOCATION", "I-LOCATION"]
    assert tags_ny[0:2] == ["B-PERSON", "I-PERSON"]
    # relation tags contain '/', entity tags never do (run_jointmodel.py:619)
    assert all("/" not in t for t in tags_ny if t != "O")


def test_instance_per_span_and_ids_stable():
    text = "alice johnson lived near new york today"
    a = instances_for_turn("conv-x", 3, text, KBD)
    b = instances_for_turn("conv-x", 3, text, KBD)
    assert a == b
    assert len(a) == 2
    assert len({i["instance_id"] for i in a}) == 2
    assert all(i["instance_id"] >= 0 for i in a)
    assert all(len(i["tokens"]) == len(i["ner_tags"]) for i in a)


def test_transcripts_round_trip_spark(spark):
    tr = transcripts(spark, 60, seed=42)
    bad = tr.where(
        F.concat_ws(" ", F.split(F.col("text"), " ")) != F.col("text")
    ).count()
    assert bad == 0
    # stable (conv_id, turn_idx) ordering: key is unique and dense
    dup = tr.groupBy("conv_id", "turn_idx").count().where("count > 1").count()
    assert dup == 0


def test_build_instances_partition_invariant(spark):
    tr = transcripts(spark, 40, seed=7).cache()
    a = build_instances(tr.repartition(2), KBD)
    b = build_instances(tr.repartition(16), KBD)
    ka = sorted(r["instance_id"] for r in a.select("instance_id").collect())
    kb_ = sorted(r["instance_id"] for r in b.select("instance_id").collect())
    assert ka == kb_ and len(ka) == len(set(ka)) and len(ka) > 0


def test_instance_taxonomy(spark):
    """pos (has '/'-tag) / ent-only split exists, per run_jointmodel.py:614-649."""
    tr = transcripts(spark, 80, seed=42)
    ins = build_instances(tr, KBD)
    flagged = ins.withColumn(
        "is_re", F.exists("ner_tags", lambda t: t.contains("/"))
    )
    counts = dict(flagged.groupBy("is_re").count().collect())
    assert counts.get(True, 0) > 0 and counts.get(False, 0) > 0
