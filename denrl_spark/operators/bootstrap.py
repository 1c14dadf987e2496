"""The bootstrap loop (run_jointmodel.py:1889-1986): noise-robust
instance selection driving pattern-set growth over rounds.

Round 0 (``data_redistribute(initial=True)``, 1820-1843):
  extract patterns -> top-k seed set M -> BoW -> matcher (J1/J2) ->
  matched train set -> negative sampling.

Round r>=1 (``bootstrap``, 1889-1931):
  score the CURRENT train set with the frozen scorer -> KL confidence vs
  target_att -> selected ids; trust := trust UNION selected (J4/U3, with
  IoU-vs-init and IoU-vs-previous stats, 1549-1558) -> mine patterns from
  trusted instances -> grow M by <= max_new_patterns per relation (U4) ->
  refresh BoW -> re-match + tail-promote -> negative sampling -> next
  train set. Each round checkpoints (CheckpointManager) with a manifest;
  a resumed run skips committed rounds.

All set algebra is DataFrame joins (never driver-side Python sets over
instance ids — SURVEY.md §4 "driver-resident sets" is the reference's
scalability wall we remove); only the pattern set M (tiny, <= a few
hundred rows) and its BoW are collected, as broadcast inputs to the
scoring UDF.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from denrl_spark.operators.attention import THRESHOLD, with_kl_confidence, with_target_att
from denrl_spark.operators.negatives import SAMPLE_RATE, negative_sampling
from denrl_spark.operators.patterns import (
    MAX_NEW_PATTERNS,
    extract_patterns,
    grow_pattern_set,
    match_instances,
    pattern_counts,
    relation_bow,
    topk_patterns,
)
from denrl_spark.operators.scoring import score_instances
from denrl_spark.plans.checkpoints import CheckpointManager
from denrl_spark.sources.kb import KB

INSTANCE_COLS = [
    "conv_id", "turn_idx", "sent_id", "instance_id", "query_id", "tokens", "ner_tags",
]


def collect_bow(bow_df: DataFrame) -> dict[str, set]:
    out: dict[str, set] = {}
    for r in bow_df.collect():
        out.setdefault(r["relation"], set()).add(r["token"])
    return out


@dataclass
class BootstrapState:
    pattern_set: DataFrame
    trust_ids: DataFrame  # column instance_id
    init_ids: DataFrame
    train: DataFrame
    stats: list[dict] = field(default_factory=list)


def initial_round(
    instances: DataFrame,
    seed: int = 42,
    use_negative_sampling: bool = True,
    sample_rate: float | None = None,
) -> BootstrapState:
    # (no KB parameter: pattern mining, matching, and sampling operate
    # on the already-tagged instance table alone)
    # cache: raw patterns feed three subtrees (top-k, J1 semi-join,
    # pattern2target) — uncached, the extraction UDF would run 3x.
    # Outputs are eagerly localCheckpoint-ed (small: pattern set + id
    # set + sampled train) so the cache can be RELEASED before
    # returning — caches held past the function leak InMemoryRelations
    # across bootstrap runs (the ADVICE-r2 leak class).
    raw = extract_patterns(instances).cache()
    pset = topk_patterns(raw).localCheckpoint()
    matched_ids = match_instances(instances, raw, pset).localCheckpoint()
    matched = instances.join(matched_ids, "instance_id", "left_semi").select(*INSTANCE_COLS)
    rate = SAMPLE_RATE if sample_rate is None else sample_rate
    train = (
        negative_sampling(matched, sample_rate=rate, seed=seed)
        if use_negative_sampling
        else matched
    ).localCheckpoint()
    raw.unpersist()
    return BootstrapState(
        pattern_set=pset, trust_ids=matched_ids, init_ids=matched_ids, train=train
    )


def _iou(a: DataFrame, b: DataFrame) -> tuple[int, float]:
    inter = a.join(b, "instance_id", "left_semi").count()
    union = a.unionByName(b).distinct().count()
    return inter, (inter / union if union else 0.0)


def bootstrap_round(
    state: BootstrapState,
    all_instances: DataFrame,
    kb: KB,
    rnd: int,
    threshold: float = THRESHOLD,
    max_new: int = MAX_NEW_PATTERNS,
    seed: int = 42,
    use_negative_sampling: bool = True,
    sample_rate: float | None = None,
) -> BootstrapState:
    bow = collect_bow(relation_bow(state.pattern_set))

    # instance_select (1509-1621): score positives of the current train
    # set, KL confidence against the target attention, keep confident ids.
    # localCheckpoint() is eager — it materializes once and truncates the
    # lineage so the many downstream counts/joins don't re-run the scorer.
    positives = state.train.where(F.col("instance_id") >= 0)
    scored = score_instances(positives, kb, bow)
    scored = with_target_att(scored, bow)
    scored = with_kl_confidence(scored, threshold=threshold)
    matched_ids = scored.where("selected").select("instance_id").distinct().localCheckpoint()

    init_inter, iou_init = _iou(matched_ids, state.init_ids)
    prev_inter, iou_prev = _iou(matched_ids, state.trust_ids)
    trust = state.trust_ids.unionByName(matched_ids).distinct().localCheckpoint()

    # patterns of trusted instances -> grow M by <= max_new per relation
    trusted_instances = all_instances.join(trust, "instance_id", "left_semi")
    new_counts = pattern_counts(extract_patterns(trusted_instances))
    pset = grow_pattern_set(state.pattern_set, new_counts, max_new=max_new).localCheckpoint()

    # data_redistribute (non-initial, 1845-1886): re-match everything
    # against the grown set, promote tails, negative-sample.
    raw_all = extract_patterns(all_instances).cache()
    matched_all = match_instances(all_instances, raw_all, pset)
    ultimate = trust.unionByName(matched_all).distinct()
    matched = all_instances.join(ultimate, "instance_id", "left_semi").select(*INSTANCE_COLS)
    rate = SAMPLE_RATE if sample_rate is None else sample_rate
    train = (
        negative_sampling(matched, sample_rate=rate, seed=seed + rnd)
        if use_negative_sampling
        else matched
    ).localCheckpoint()

    # every output above is checkpointed (eager), so the round's big
    # intermediate cache can be released before returning
    raw_all.unpersist()

    stats = {
        "round": rnd,
        "n_selected": matched_ids.count(),
        "n_trust": trust.count(),
        "init_intersect": init_inter,
        "IoU_init": iou_init,
        "prev_intersect": prev_inter,
        "IoU_prev": iou_prev,
        "pattern_set_size": pset.count(),
    }
    return BootstrapState(
        pattern_set=pset,
        trust_ids=trust,
        init_ids=state.init_ids,
        train=train,
        stats=state.stats + [stats],
    )


def run_bootstrap(
    spark: SparkSession,
    instances: DataFrame,
    kb: KB | None = None,
    rounds: int = 2,
    checkpoint_dir: str | None = None,
    seed: int = 42,
    threshold: float = THRESHOLD,
    sample_rate: float | None = None,
    max_new: int = MAX_NEW_PATTERNS,
) -> BootstrapState:
    """Full loop with optional checkpoint/resume. ``rounds`` counts the
    post-initial bootstrap iterations (reference runs one per epoch after
    boot_start_epoch, README.md:31)."""
    kb = kb or KB.default()
    instances = instances.cache()
    ckpt = CheckpointManager(checkpoint_dir) if checkpoint_dir else None

    if ckpt and ckpt.is_committed("train", 0):
        state = BootstrapState(
            pattern_set=ckpt.read(spark, "pattern_set", 0).select(
                "relation", "pattern", "cnt", "rank"
            ),
            trust_ids=ckpt.read(spark, "trust_ids", 0).select("instance_id"),
            init_ids=ckpt.read(spark, "trust_ids", 0).select("instance_id"),
            train=ckpt.read(spark, "train", 0).select(*INSTANCE_COLS),
        )
    else:
        # initial_round returns eagerly-checkpointed frames already
        state = initial_round(instances, seed=seed, sample_rate=sample_rate)
        if ckpt:
            ckpt.write(state.pattern_set, "pattern_set", 0)
            ckpt.write(state.trust_ids, "trust_ids", 0)
            ckpt.write(state.train, "train", 0)

    for rnd in range(1, rounds + 1):
        if ckpt and ckpt.is_committed("train", rnd):
            state = BootstrapState(
                pattern_set=ckpt.read(spark, "pattern_set", rnd).select(
                    "relation", "pattern", "cnt", "rank"
                ),
                trust_ids=ckpt.read(spark, "trust_ids", rnd).select("instance_id"),
                init_ids=state.init_ids,
                train=ckpt.read(spark, "train", rnd).select(*INSTANCE_COLS),
                stats=state.stats + [ckpt.manifest("train", rnd)["stats"]],
            )
            continue
        t0 = time.time()
        state = bootstrap_round(
            state, instances, kb, rnd, threshold=threshold, max_new=max_new,
            seed=seed, sample_rate=sample_rate,
        )
        # per-round wall time rides the stats record (and the checkpoint
        # manifest) so large-corpus runs document round cost
        state.stats[-1]["round_sec"] = round(time.time() - t0, 3)
        if ckpt:
            ckpt.write(state.pattern_set, "pattern_set", rnd)
            ckpt.write(state.trust_ids, "trust_ids", rnd)
            ckpt.write(state.train, "train", rnd, stats=state.stats[-1])
    return state
