"""BIO span grouping (E2) and triple assembly (E3).

Faithful word-level re-expression of the reference decode path:

- span grouping: ``group_entities`` / ``group_sub_entities``
  (run_jointmodel.py:1297-1368) — adjacent same-type tokens merge unless
  the later one is ``B-``-prefixed (two B- spans never merge,
  run_jointmodel.py:1343-1350). The rebuild is word-level (the reference's
  run_lstm.py variant is the word-level semantic spec), so the subword
  machinery (E1) collapses away.
- triple assembly: ``entities2dict`` (845-874) + ``merge_ent_dict``
  (876-902) + ``extract_triplets(is_label=True)`` (904-933): per sentence,
  instances are folded in order into a span-keyed dict; each query span
  becomes ent1 with its tag, every other surviving span in that instance
  becomes a related ent2; queries that predict no span but some related
  spans emit ent1_tag="None"; entries without related spans emit
  (ent1, tag, "", "None").

The per-sentence fold is insertion-order-sensitive, so the Spark wrapper
imposes explicit ordering (sort by query_id, instance_id within each
sent_id group) — SURVEY.md §7 "order-sensitive assembly".

Spark surface: ``groupBy(sent_id).applyInPandas`` — distributed by
sentence, Arrow-batched, emits only triples (never the O(T^2) logits
tensor, SURVEY.md §4).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

TRIPLE_SCHEMA = (
    "sent_id bigint, ent1 string, ent1_tag string, ent2 string, ent2_tag string"
)


def group_spans(tokens: list[str], tags: list[str]) -> list[dict]:
    """Group BIO-tagged tokens into spans.

    Returns [{"entity_group": type, "word": joined tokens, "index": [i...]}]
    mirroring run_jointmodel.py:1297-1368 at word level: 'O' dropped; a
    span extends while the next token is adjacent, has the same type, and
    is not B-prefixed.
    """
    ents = [
        (i, tag, tag.split("-")[-1]) for i, tag in enumerate(tags) if tag != "O"
    ]
    groups: list[dict] = []
    cur: list[tuple[int, str, str]] = []
    for item in ents:
        if cur and item[2] == cur[-1][2] and not item[1].startswith("B") and item[0] == cur[-1][0] + 1:
            cur.append(item)
        else:
            if cur:
                groups.append(_finish(cur, tokens))
            cur = [item]
    if cur:
        groups.append(_finish(cur, tokens))
    return groups


def _finish(cur, tokens):
    idx = [i for i, _, _ in cur]
    return {
        "entity_group": cur[0][2],
        "word": " ".join(tokens[i] for i in idx),
        "index": idx,
    }


def fold_instance(entities: list[dict], query_id: int, ent_dict: dict) -> None:
    """entities2dict (run_jointmodel.py:845-874): fold one instance's
    grouped spans into the per-sentence dict keyed by span index tuple."""
    related = {}
    ent_record = None
    for e in entities:
        tag, index, word = e["entity_group"], tuple(sorted(e["index"])), e["word"].strip()
        if index[0] == query_id:
            ent_dict.setdefault(index, {})["entity_group"] = tag
            ent_dict[index]["word"] = word
            ent_record = index
        else:
            related[index] = (tag, word)
    if ent_record is not None:
        ent_dict[ent_record]["related_ent"] = related
    elif related:
        d = ent_dict.setdefault((query_id,), {})
        d["entity_group"] = "None"
        d["word"] = ""
        d["related_ent"] = related


def merge_ent_dict(ent_dict: dict) -> list[dict]:
    """merge_ent_dict (run_jointmodel.py:876-902): dict -> triple list
    (duplicates preserved, insertion order preserved)."""
    out = []
    for _, items in ent_dict.items():
        t1, w1 = items["entity_group"], items["word"]
        if not items["related_ent"]:
            out.append({"ent1": w1, "ent1_tag": t1, "ent2": "", "ent2_tag": "None"})
        else:
            for _, (t2, w2) in items["related_ent"].items():
                out.append({"ent1": w1, "ent1_tag": t1, "ent2": w2, "ent2_tag": t2})
    return out


def sentence_triples(instances: list[dict]) -> list[dict]:
    """extract_triplets(is_label=True) for ONE sentence: instances is a
    list of {query_id, tokens, ner_tags} dicts in canonical order
    (query_id, instance_id). Pure; shared by Spark wrapper and oracle."""
    ent_dict: dict = {}
    for ins in instances:
        groups = group_spans(ins["tokens"], ins["ner_tags"])
        fold_instance(groups, ins["query_id"], ent_dict)
    return merge_ent_dict(ent_dict)


def assemble_triples(instances_df: DataFrame, tags_col: str = "ner_tags") -> DataFrame:
    """Instance table -> triples table, one group per sentence.

    Emits (sent_id, ent1, ent1_tag, ent2, ent2_tag) with reference
    duplicate/order semantics. ``tags_col`` selects gold tags or a
    predicted-tags column so the same assembler serves both paths.
    """
    cols = instances_df.select(
        "sent_id", "instance_id", "query_id", "tokens", tags_col
    )

    def per_sentence(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["query_id", "instance_id"])
        sid = int(pdf["sent_id"].iloc[0])
        ins = [
            {"query_id": int(q), "tokens": list(t), "ner_tags": list(g)}
            for q, t, g in zip(pdf["query_id"], pdf["tokens"], pdf[tags_col])
        ]
        trips = sentence_triples(ins)
        return pd.DataFrame(
            [
                (sid, d["ent1"], d["ent1_tag"], d["ent2"], d["ent2_tag"])
                for d in trips
            ],
            columns=["sent_id", "ent1", "ent1_tag", "ent2", "ent2_tag"],
        )

    return cols.groupBy("sent_id").applyInPandas(per_sentence, TRIPLE_SCHEMA)
