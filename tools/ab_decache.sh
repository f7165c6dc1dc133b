#!/bin/bash
set -x
cd /root/repo
Q="near_dup_lsh_pairs near_dup_components near_dup_keep_best dedup_graph_triangles dedup_agreement_audit ann_lsh_bucketed embedding_near_dup ann_ivf_topk ann_ivf_multiprobe pq_ann_shortlist pq_adc_search pq_recall ivfpq_residual_search lsh_band_sweep lsh_band_sweep_sampled bucketed_join_no_shuffle dedup_latest prefix_filter"
MISSING_BEFORE="near_dup_lsh_pairs near_dup_components ann_lsh_bucketed embedding_near_dup ann_ivf_topk ann_ivf_multiprobe pq_ann_shortlist pq_adc_search pq_recall ivfpq_residual_search bucketed_join_no_shuffle"
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
# ---- BEFORE (HEAD with caches) ----
git stash push -m decache-wip -- bridgedownstream_spark bench.py tools/profile_queries.py || exit 1
rm -rf /tmp/bds_lshcand_* /tmp/bds_pq_* /tmp/bds_ivfpq_* /tmp/bds_bucketed_*
python bench.py $Q > logs/bench_before_decache.out 2>&1
cp BENCH_LAST.json logs/bench_before_decache.json
python tools/profile_queries.py --plans plans/r09 --suffix _before /root/testdata/sf0.1 $MISSING_BEFORE > logs/plans_before_decache.log 2>&1
# ---- AFTER (de-cached) ----
git stash pop || exit 1
rm -rf /tmp/bds_lshcand_* /tmp/bds_pq_* /tmp/bds_ivfpq_* /tmp/bds_bucketed_*
python bench.py $Q > logs/bench_after_decache.out 2>&1
cp BENCH_LAST.json logs/bench_after_decache.json
rm -rf /tmp/bds_lshcand_* /tmp/bds_pq_* /tmp/bds_ivfpq_*  # must stay absent
python tools/profile_queries.py --plans plans/r09 --suffix _after /root/testdata/sf0.1 ${Q% dedup_latest prefix_filter} > logs/plans_after_decache.log 2>&1
echo ALL_DONE
