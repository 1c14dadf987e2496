"""No-Spark control: the exact fused-path Python work under
multiprocessing at N pinned cores. Isolates engine overhead from box
limits: if THIS caps at the same 8->32 efficiency, the box is the cap."""
import sys, time, json
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import multiprocessing as mp
import numpy as np

def work(rows):
    from denrl_spark.sources.kb import KB
    from denrl_spark.operators.tagging import instances_and_spans_for_turn
    from denrl_spark.operators.scoring import (
        bio_transitions, build_label_list, emissions_from_spans, viterbi_batch)
    from denrl_spark.operators.spans import sentence_triples
    kb = KB.default()
    labels = build_label_list(kb)
    li = {l: i for i, l in enumerate(labels)}
    trans = bio_transitions(labels)
    sent_instances, sent_spans = [], []
    for conv_id, turn_idx, text in rows:
        ins, spans = instances_and_spans_for_turn(conv_id, int(turn_idx), text, kb)
        if ins:
            ins.sort(key=lambda d: (d["query_id"], d["instance_id"]))
            sent_instances.append(ins); sent_spans.append(spans)
    flat = [(d, sp) for ins, sp in zip(sent_instances, sent_spans) for d in ins]
    order = sorted(range(len(flat)), key=lambda i: len(flat[i][0]["tokens"]))
    for lo in range(0, len(order), 4096):
        idxs = order[lo:lo+4096]
        lengths = np.array([len(flat[i][0]["tokens"]) for i in idxs], dtype=np.int64)
        tmax = int(lengths.max())
        em = np.zeros((len(idxs), tmax, len(labels)), dtype=np.float32)
        for r, i in enumerate(idxs):
            d, sp = flat[i]
            em[r, :lengths[r], :] = emissions_from_spans(d["tokens"], sp, d["query_id"], kb, li, d["instance_id"])
        ids = viterbi_batch(em, trans, lengths)
        for r, i in enumerate(idxs):
            flat[i][0]["ner_tags"] = [labels[j] for j in ids[r, :lengths[r]]]
    n = 0
    for ins in sent_instances:
        n += len(sentence_triples(ins))
    return n

def run_at(nproc, rows):
    import os
    os.sched_setaffinity(0, set(range(nproc)))
    chunks = [rows[i::nproc*2] for i in range(nproc*2)]
    with mp.Pool(nproc) as p:
        p.map(work, [rows[:200]]*nproc)  # warm all workers
        t0 = time.time()
        tot = sum(p.map(work, chunks))
        dt = time.time() - t0
    os.sched_setaffinity(0, set(range(32)))
    return dt, tot

if __name__ == "__main__":
    import duckdb
    inp = sys.argv[1] if len(sys.argv) > 1 else "/tmp/denrl_scaling_input_240000/*.parquet"
    rows = duckdb.sql(f"SELECT conv_id, turn_idx, text FROM '{inp}'").fetchall()
    print("rows:", len(rows))
    effs = []
    for rep in range(3):
        lo, _ = run_at(8, rows)
        hi, n = run_at(32, rows)
        effs.append(round(lo / (4 * hi), 3))
        print(f"rep{rep}: 8c={lo:.1f}s 32c={hi:.1f}s eff={effs[-1]} triples={n}")
    effs.sort()
    print(json.dumps({"control_mp_8_32_median_eff": effs[1], "all": effs}))
