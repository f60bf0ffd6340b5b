#!/usr/bin/env python
"""Compare two bench result files and flag regressions.

The driver writes ``BENCH_r{N}.json`` per round; rows can silently regress
between rounds unless something diffs them (VERDICT r3 item 3 was exactly
that: a serving loadtest that lived only in prose). This tool matches rows
across two result files by a normalized metric key and reports the delta,
exiting non-zero if any row regressed more than ``--tolerance``.

For latency-type rows (units of ms, or latency percentile fields) lower is
better; for throughput rows higher is better.

Usage:
    python tools/bench_compare.py BENCH_r03.json BENCH_r04.json
    python tools/bench_compare.py old.json new.json --tolerance 0.10
"""

from __future__ import annotations

import argparse
import json
import re
import sys


def load_rows(path: str):
    """Rows from a bench result: accepts the driver's ``BENCH_r{N}.json``
    wrapper ({"parsed": {...}}), a whole-file bench JSON, or raw bench
    stdout (takes the last parseable line, like the driver does)."""
    try:
        doc = json.load(open(path))
        if isinstance(doc, dict):
            if isinstance(doc.get('parsed'), dict):
                return doc['parsed'].get('rows', [])
            if 'rows' in doc:
                return doc['rows']
            if 'tail' in doc:          # driver wrapper whose parse failed:
                last = None            # scan the captured stdout tail
                for line in str(doc['tail']).splitlines():
                    if line.strip().startswith('{'):
                        try:
                            last = json.loads(line)
                        except json.JSONDecodeError:
                            continue
                if last is not None:
                    return last.get('rows', [])
                raise SystemExit(f'{path}: driver wrapper holds no '
                                 f'parseable bench output (rc='
                                 f'{doc.get("rc")})')
    except json.JSONDecodeError:
        pass
    last = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith('{'):
                try:
                    last = json.loads(line)
                except json.JSONDecodeError:
                    continue
    if last is None:
        raise SystemExit(f'{path}: no parseable JSON line')
    return last.get('rows', [])


def row_key(metric: str) -> str:
    """Stable cross-round identity for a row: the metric string minus the
    parenthesized config notes that legitimately evolve round-to-round."""
    key = re.sub(r'\([^)]*\)', '', metric)
    return re.sub(r'\s+', ' ', key).strip()


def compare(old_rows, new_rows, tolerance: float):
    old = {row_key(r['metric']): r for r in old_rows}
    new = {row_key(r['metric']): r for r in new_rows}
    regressions, lines = [], []
    for key, nr in new.items():
        orow = old.get(key)
        if orow is None:
            lines.append(f'  NEW     {key}: {nr["value"]} {nr["unit"]}')
            continue
        lower_better = nr['unit'] in ('ms', 's')
        ov, nv = float(orow['value']), float(nr['value'])
        if ov == 0:
            continue
        delta = (nv - ov) / abs(ov)
        regressed = delta < -tolerance if not lower_better \
            else delta > tolerance
        arrow = 'REGRESS' if regressed else ('better ' if (
            delta > 0) != lower_better and abs(delta) > 0.005 else 'flat   ')
        lines.append(f'  {arrow} {key}: {ov} -> {nv} {nr["unit"]} '
                     f'({delta:+.1%})')
        if regressed:
            regressions.append((key, ov, nv, delta))
    for key in old:
        if key not in new:
            lines.append(f'  DROPPED {key}')
            regressions.append((key, old[key]['value'], None, None))
    return regressions, lines


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('old')
    ap.add_argument('new')
    ap.add_argument('--tolerance', type=float, default=0.10,
                    help='relative regression allowed before failing '
                         '(default 10%% — tunnel-noise headroom)')
    args = ap.parse_args(argv)
    regressions, lines = compare(load_rows(args.old), load_rows(args.new),
                                 args.tolerance)
    print(f'bench compare: {args.old} -> {args.new} '
          f'(tolerance {args.tolerance:.0%})')
    print('\n'.join(lines))
    if regressions:
        print(f'{len(regressions)} REGRESSION(S):', file=sys.stderr)
        for key, ov, nv, delta in regressions:
            print(f'  {key}: {ov} -> {nv}'
                  + (f' ({delta:+.1%})' if delta is not None else ' (dropped)'),
                  file=sys.stderr)
        return 1
    print('no regressions')
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
