"""Bootstrap loop: selection, pattern growth, checkpoint/resume."""

import json
import os

from pyspark.sql import functions as F

from denrl_spark.operators.bootstrap import initial_round, run_bootstrap
from denrl_spark.operators.tagging import build_instances
from denrl_spark.sources.corpus import transcripts
from denrl_spark.sources.kb import KB

KBD = KB.default()


def _instances(spark, n=50, seed=42):
    return build_instances(transcripts(spark, n, seed=seed), KBD).cache()


def test_initial_round_shapes(spark):
    ins = _instances(spark)
    st = initial_round(ins, seed=42)
    assert st.pattern_set.count() > 0
    n_train = st.train.count()
    assert n_train > 0
    # train contains negatives (id < 0) and positives
    kinds = dict(
        st.train.withColumn("neg", F.col("instance_id") < 0).groupBy("neg").count().collect()
    )
    assert kinds.get(False, 0) > 0 and kinds.get(True, 0) > 0


def test_bootstrap_monotone_growth(spark, tmp_path):
    ins = _instances(spark)
    st = run_bootstrap(spark, ins, KBD, rounds=2, checkpoint_dir=str(tmp_path / "ck"))
    assert len(st.stats) == 2
    sizes = [s["pattern_set_size"] for s in st.stats]
    init_size = st.init_ids.count()
    # pattern set never shrinks; trust set never shrinks below init
    assert sizes == sorted(sizes)
    assert st.trust_ids.count() >= init_size
    assert 0.0 <= st.stats[-1]["IoU_init"] <= 1.0


def test_checkpoint_resume_skips_committed(spark, tmp_path):
    ins = _instances(spark, n=30)
    ck = str(tmp_path / "ck2")
    st1 = run_bootstrap(spark, ins, KBD, rounds=1, checkpoint_dir=ck)
    # manifests committed for rounds 0 and 1
    for rnd in (0, 1):
        mpath = os.path.join(ck, f"round={rnd}", "train.manifest.json")
        assert os.path.exists(mpath)
        m = json.load(open(mpath))
        assert m["rows"] > 0
    # resume: same result, no recompute of committed rounds
    st2 = run_bootstrap(spark, ins, KBD, rounds=1, checkpoint_dir=ck)
    a = sorted(r["instance_id"] for r in st1.train.select("instance_id").collect())
    b = sorted(r["instance_id"] for r in st2.train.select("instance_id").collect())
    assert a == b
    # lineage columns present in the checkpointed parquet
    dfr = spark.read.parquet(os.path.join(ck, "round=1", "train"))
    assert {"round", "src_partition"} <= set(dfr.columns)


def test_kl_selection_filters_noisy_instances(spark):
    """The DENRL core semantic: instances whose tags disagree with the
    pattern evidence get low confidence and are NOT selected, while clean
    instances are (run_jointmodel.py:1535-1547 selection behavior)."""
    from pyspark.sql import functions as F

    from denrl_spark.operators.attention import with_kl_confidence, with_target_att
    from denrl_spark.operators.bootstrap import collect_bow
    from denrl_spark.operators.patterns import extract_patterns, relation_bow, topk_patterns
    from denrl_spark.operators.scoring import score_instances

    ins = _instances(spark, n=60)
    bow = collect_bow(relation_bow(topk_patterns(extract_patterns(ins))))

    # corrupt relation instances: swap every relation tag for a WRONG
    # relation so target_att points at tokens the scorer's position
    # attention (from predicted tags) does not
    wrong = "/people/person/nationality"
    corrupted = ins.where(
        F.exists("ner_tags", lambda t: t.contains("/"))
        & ~F.exists("ner_tags", lambda t: t.contains(wrong))
    ).withColumn(
        "ner_tags",
        F.transform(
            "ner_tags",
            lambda t: F.when(
                t.contains("/"), F.concat(F.substring(t, 1, 2), F.lit(wrong))
            ).otherwise(t),
        ),
    )

    def selection_rate(df):
        scored = score_instances(df, None, bow)
        scored = with_target_att(scored, bow)
        sel = with_kl_confidence(scored)
        n = sel.count()
        return sel.where("selected").count() / n if n else 0.0

    clean_rate = selection_rate(
        ins.where(F.exists("ner_tags", lambda t: t.contains("/")))
    )
    noisy_rate = selection_rate(corrupted)
    assert clean_rate > 0.9
    assert noisy_rate < clean_rate - 0.3, (clean_rate, noisy_rate)
