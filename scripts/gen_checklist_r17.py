#!/usr/bin/env python3
"""Emit the OPTIMIZATION_r17.md per-query checklist: family tables with
before (BENCH_BEFORE_r17) and final (BENCH_LOCAL) seconds and a status
letter. R = restructured directly this round; E = examined individually
(QProf/A-B/isolated), deliberately left; F = family-level examination,
inherits the engine-wide r17 changes (C1 Cow concurrency + SchemaMemo
read, C2 concurrent updateRows staging, C3 merge-aware
Manifest.snapshot, C4 SchemaMemo bounded eviction, C5 sweep fan floor).
"""
import json, re, collections, sys

before = json.load(open('plans/r17/BENCH_BEFORE_r17.json'))['queries']
final = json.load(open(sys.argv[1] if len(sys.argv) > 1
                       else 'BENCH_LOCAL.json'))['queries']

R = {  # directly restructured, with per-query evidence in the notes
    'd21_budget_neardup', 'd22_budget_containment', 'd23_budget_docsample',
    'd24_census_jaccard', 'd25_census_containment',
    'io23_incremental', 'io24_skip_scan', 'io39_dsv2_skipscan',
    'io31_torn_index', 'io59_manifest_stats', 'io63_mor_update',
    'io70_cdc_apply',
    's11_sq8_stored', 's13_pq_stored', 's15_hybrid_stored',
    's22_hybrid_recall',
    'st15_stream_hybrid', 'st16_stream_health', 'st17_stream_takedown',
    'st23_dim_refresh',
    't25_bm25_incr', 't26_bm25_compact', 't27_bm25_takedown',
}
E = {  # examined individually this round, left alone (reason in notes)
    'd2_jaccard_neardup', 'd6_cluster', 'd15_canonical', 'd17_funnel',
    'io62_sql_partitioned', 'io65_zorder_cluster', 'io66_scoped_compact',
    'io67_zorder_types', 'io68_table_changes',
    's12_hybrid_rrf', 's21_whitened_pq_recall',
    'st3_stream_window', 'st4_stream_dedup', 'st7_stream_session',
    'st10_sessionize_tws', 'st11_stream_bm25', 'st21_stream_topk',
    'st22_keytable_dedup', 'st26_table_dedup_etl',
    'st29_stream_mor', 'st30_stream_cdc',
    't22_chunking', 't23_bm25', 't24_bm25_stored',
    'q12_set_ops',
}

fams = collections.defaultdict(list)
for k in sorted(before):
    fams[re.match(r'[a-z]+', k).group(0)].append(k)

for f, ks in sorted(fams.items()):
    print(f"\n**{f} family** ({len(ks)} queries):\n")
    print("| query | before | final | status |")
    print("|---|---|---|---|")
    for k in ks:
        st = 'R' if k in R else 'E' if k in E else 'F'
        print(f"| {k} | {before[k]:.2f} | {final.get(k, float('nan')):.2f}"
              f" | {st} |")
