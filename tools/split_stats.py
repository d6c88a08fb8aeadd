#!/usr/bin/env python3
"""One-off: split registry/StatsQueries.scala (3.1k lines, over the 3k
hygiene cap) at the inference/eval seam Rollups used — pure move, no
entry text changes. Queries and oracles stay co-located per family.
"""
import re, sys

SRC = 'src/main/scala/graft/registry/StatsQueries.scala'

INFERENCE = {
    'q156_ab_ztest', 'q173_bootstrap_ci', 'q175_mutual_info', 'q178_fdr',
    'q182_chi_square', 'q192_ks_test', 'q196_spearman', 'q199_mann_whitney',
    'q204_corr_matrix', 'q207_anova', 'q208_welch', 'q210_mde',
    'q214_bootstrap_diff', 'q218_ols2', 'q219_partial_corr',
    'q226_paired_uplift', 'q233_srm', 'q244_cuped', 'q245_ratio_delta',
    'q255_heterogeneity', 'q256_permutation', 'q257_yuen', 'q275_msprt',
    'q284_msprt_srm', 'q286_eb_shrink', 'q287_tukey', 'q291_kendall_tau',
    'q292_kruskal_wallis', 'q293_mann_kendall', 'q295_friedman',
    'q298_brown_forsythe', 'q300_wilson', 'q310_effect_size',
    'q311_newcombe', 'q313_odds_ratio', 'q330_jonckheere',
    'q331_cochran_armitage',
}
EVAL = {
    'q216_auc', 'q227_ece', 'q238_lift_curve', 'q241_qini',
    'q262_roc_curve', 'q263_pr_curve', 'q264_best_f1', 'q265_kappa',
    'q267_mcc', 'q268_brier', 'q273_krippendorff',
}

text = open(SRC).read()
lines = text.split('\n')

# locate section starts
q_start = next(i for i, l in enumerate(lines)
               if l.startswith('  val queries:'))
o_start = next(i for i, l in enumerate(lines)
               if l.startswith('  val oracles:'))
header = lines[:q_start]

def parse_entries(start):
    """Entries inside a Seq( ... ) closing with a line '  )'."""
    entries = []  # (name, [lines])
    cur_name, cur = None, []
    i = start + 1
    while True:
        l = lines[i]
        if l == '  )':
            if cur_name:
                entries.append((cur_name, cur))
            return entries, i
        m = re.match(r'    "(q\d+_\w+)" ->', l)
        if m:
            if cur_name:
                entries.append((cur_name, cur))
            cur_name, cur = m.group(1), [l]
        else:
            cur.append(l)
        i += 1

q_entries, q_end = parse_entries(q_start)
o_entries, o_end = parse_entries(o_start)
assert lines[o_end + 1] == '}', lines[o_end + 1]
assert o_end + 2 >= len(lines) - 1

qnames = {n for n, _ in q_entries}
onames = {n for n, _ in o_entries}
assert qnames == onames, qnames ^ onames
missing = (INFERENCE | EVAL) - qnames
assert not missing, missing

def strip_trailing_comma(entry_lines):
    out = list(entry_lines)
    # drop blank trailing lines, ensure last content line ends with ','
    while out and out[-1].strip() == '':
        out.pop()
    if not out[-1].rstrip().endswith(','):
        out[-1] = out[-1] + ','
    return out

def emit(path, obj_name, doc, qsel, osel):
    body = header[:]
    # replace the scaladoc block: keep imports (everything up to the
    # first line starting with '/**'), then write the new doc
    doc_i = next(i for i, l in enumerate(body) if l.startswith('/**'))
    body = body[:doc_i]
    body.append(doc)
    body.append(f'private[graft] object {obj_name} {{')
    body.append('')
    body.append('  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(')
    for n, e in qsel:
        body.extend(strip_trailing_comma(e))
    body.append('  )')
    body.append('')
    body.append('  val oracles: Seq[(String, String)] = Seq(')
    for n, e in osel:
        body.extend(strip_trailing_comma(e))
    body.append('  )')
    body.append('}')
    body.append('')
    open(path, 'w').write('\n'.join(body))
    print(f'{path}: {len(qsel)} queries, {len(body)} lines')

def pick(entries, names):
    return [(n, e) for n, e in entries if n in names]

KEEP = qnames - INFERENCE - EVAL
emit(SRC, 'StatsQueries',
     '/** Registry shard — relational + descriptive statistics: TPC-H-style\n'
     '  * relational queries and the descriptive/rollup statistics family.\n'
     '  *\n'
     '  * Every query here has its DuckDB oracle co-located below with\n'
     '  * IDENTICAL column names (the driver contract; see SparkEntry).\n'
     '  */',
     pick(q_entries, KEEP), pick(o_entries, KEEP))
emit('src/main/scala/graft/registry/StatsInferenceQueries.scala',
     'StatsInferenceQueries',
     '/** Registry shard — statistical inference: hypothesis tests,\n'
     '  * experiment analysis (A/B, sequential, uplift), correlation and\n'
     '  * trend significance (SURVEY.md family F). Split from StatsQueries\n'
     '  * at the inference/eval seam (the Rollups split rule: no file >3k).\n'
     '  *\n'
     '  * Every query here has its DuckDB oracle co-located below with\n'
     '  * IDENTICAL column names (the driver contract; see SparkEntry).\n'
     '  */',
     pick(q_entries, INFERENCE), pick(o_entries, INFERENCE))
emit('src/main/scala/graft/registry/StatsEvalQueries.scala',
     'StatsEvalQueries',
     '/** Registry shard — model-evaluation metrics: ranking/calibration\n'
     '  * curves and agreement scores (AUC, ROC/PR, F1, kappa, MCC, Brier,\n'
     '  * ECE, qini/lift, Krippendorff). Split from StatsQueries at the\n'
     '  * inference/eval seam (the Rollups split rule: no file >3k).\n'
     '  *\n'
     '  * Every query here has its DuckDB oracle co-located below with\n'
     '  * IDENTICAL column names (the driver contract; see SparkEntry).\n'
     '  */',
     pick(q_entries, EVAL), pick(o_entries, EVAL))
