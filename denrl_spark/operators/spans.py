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
    # type extraction: the reference uses tag.split("-")[-1]
    # (run_jointmodel.py:1307), identical to tag[2:] on NYT-style labels
    # (no hyphens inside names). The rebuild uses tag[2:] for B-/I- tags
    # so hyphenated relation names (e.g. /x/co-founder) stay intact and
    # consistent with patterns.py/attention.py, falling back to the
    # reference rule for unprefixed tags.
    def tag_type(tag: str) -> str:
        return tag[2:] if tag[:2] in ("B-", "I-") else tag.split("-")[-1]

    ents = [
        (i, tag, tag_type(tag)) for i, tag in enumerate(tags) if tag != "O"
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


def assemble_triples(
    instances_df: DataFrame,
    tags_col: str = "ner_tags",
    assume_grouped: bool = False,
) -> DataFrame:
    """Instance table -> triples table, grouped per sentence.

    Emits (sent_id, ent1, ent1_tag, ent2, ent2_tag) with reference
    duplicate/order semantics. ``tags_col`` selects gold tags or a
    predicted-tags column so the same assembler serves both paths.

    Physical shape: repartition by sent_id + sortWithinPartitions +
    ``mapInPandas`` streaming over contiguous sentence runs. This is the
    hot aggregation of the whole engine (one group per sentence, 10^12
    groups at target scale): a grouped-map (applyInPandas) pays a pandas
    DataFrame construction per GROUP, which measured ~2.7x slower and
    scaled worse than streaming the sorted partition (sentence runs never
    straddle partitions; runs straddling Arrow batch boundaries are
    carried over between batches).

    ``assume_grouped=True`` skips the shuffle+sort entirely: valid when
    the input preserves builder layout (all instances of a sentence
    contiguous within a partition, already in (query_id, instance_id)
    order) — true for build_instances -> score_instances chains, which
    are row-wise and order-preserving. At 100 TB this avoids re-shuffling
    the widest columns (tokens/tags arrays) through disk; it is the
    co-partitioning-reuse pattern (partition once, flow through).
    """
    if assume_grouped:
        cols = instances_df.select(
            "sent_id", "instance_id", "query_id", "tokens", tags_col
        )
    else:
        spark = instances_df.sparkSession
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
        cols = (
            instances_df.select("sent_id", "instance_id", "query_id", "tokens", tags_col)
            .repartition(n_part, "sent_id")
            .sortWithinPartitions("sent_id", "query_id", "instance_id")
        )

    def gen(batches):
        carry: list[tuple] = []  # rows of the unfinished trailing sentence

        def flush(rows: list[tuple]):
            ins = [
                {"query_id": int(q), "tokens": list(t), "ner_tags": list(g)}
                for (_, q, t, g) in rows
            ]
            sid = int(rows[0][0])
            return [
                (sid, d["ent1"], d["ent1_tag"], d["ent2"], d["ent2_tag"])
                for d in sentence_triples(ins)
            ]

        for pdf in batches:
            out: list[tuple] = []
            sids = pdf["sent_id"].to_numpy()
            qids = pdf["query_id"].to_numpy()
            toks = pdf["tokens"].to_numpy()
            tags = pdf[tags_col].to_numpy()
            for i in range(len(sids)):
                row = (sids[i], qids[i], toks[i], tags[i])
                if carry and carry[0][0] != row[0]:
                    out.extend(flush(carry))
                    carry = []
                carry.append(row)
            yield pd.DataFrame(
                out, columns=["sent_id", "ent1", "ent1_tag", "ent2", "ent2_tag"]
            )
        if carry:
            yield pd.DataFrame(
                flush(carry),
                columns=["sent_id", "ent1", "ent1_tag", "ent2", "ent2_tag"],
            )

    return cols.mapInPandas(gen, TRIPLE_SCHEMA)
