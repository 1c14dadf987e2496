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
    st = initial_round(ins, KBD, seed=42)
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
