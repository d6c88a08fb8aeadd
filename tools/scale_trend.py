#!/usr/bin/env python3
"""Scale-trend report (VERDICT r13 item 2): per-query wall(sf1) /
wall(sf0.1) ratios from two graft-bench-1 artifacts, flagging anything
super-linear (ratio > FLAG, default 15x for 10x data — walls here are
min-of-N with a 3-5x sandbox band, so 15x is the conservative line).

Writes BENCH_SF1_TREND.json and appends a section to BASELINE.md.

Usage: python3 tools/scale_trend.py [BENCH_FULL.json] [BENCH_SF1.json]
"""
import json, sys, datetime

base_path = sys.argv[1] if len(sys.argv) > 1 else 'BENCH_FULL.json'
sf1_path = sys.argv[2] if len(sys.argv) > 2 else 'BENCH_SF1.json'
FLAG = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0

def walls(path):
    d = json.loads(open(path).read())
    qs = d['queries']
    if isinstance(qs, str):
        sys.exit(f'{path}: summary-form artifact (queries={qs}); need full form')
    return ({k: v for k, v in qs.items() if isinstance(v, (int, float))},
            {k: v['err'] for k, v in qs.items() if isinstance(v, dict)},
            d.get('sf', '?'))

base, base_err, base_sf = walls(base_path)
sf1, sf1_err, sf1_sf = walls(sf1_path)
common = sorted(set(base) & set(sf1))
only_base = sorted(set(base) - set(sf1) - set(sf1_err))
ratios = {k: (sf1[k] / base[k] if base[k] > 0 else None) for k in common}
flagged = sorted((k for k, r in ratios.items() if r and r > FLAG),
                 key=lambda k: -ratios[k])
out = {
    'schema': 'graft-scale-trend-1',
    'base_sf': base_sf, 'sf1_sf': sf1_sf, 'flag_ratio': FLAG,
    'n_common': len(common),
    'flagged': {k: {'base': base[k], 'sf1': sf1[k],
                    'ratio': round(ratios[k], 2)} for k in flagged},
    'sf1_errors': sf1_err,
    'ratios': {k: round(r, 2) for k, r in ratios.items() if r},
}
open('BENCH_SF1_TREND.json', 'w').write(json.dumps(out) + '\n')

top = sorted(((r, k) for k, r in ratios.items() if r), reverse=True)[:12]
stamp = datetime.date.today().isoformat()
lines = [
    '',
    f'## Scale trend {stamp} (wall(sf1)/wall(sf0.1), auto-appended by scale_trend.py)',
    '',
    f'{len(common)} common queries; flag line {FLAG:.0f}x for 10x data. '
    f'Flagged super-linear: **{", ".join(flagged) if flagged else "none"}**.'
    + (f' sf1 errors: {", ".join(sf1_err)}.' if sf1_err else ''),
    '',
    '| query | sf0.1 s | sf1 s | ratio |',
    '|---|---|---|---|',
]
for r, k in top:
    lines.append(f'| {k} | {base[k]:.2f} | {sf1[k]:.2f} | {r:.1f}x |')
lines.append('')
lines.append(f'Full ratio table in BENCH_SF1_TREND.json.')
with open('BASELINE.md', 'a') as f:
    f.write('\n'.join(lines) + '\n')
print(f'common={len(common)} flagged={flagged} sf1_errors={list(sf1_err)}')
print('top ratios:', [(k, round(r, 1)) for r, k in top[:8]])
