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


def _rows_from_doc(doc):
    """Rows from one parsed bench JSON object: the full cumulative form
    carries 'rows'; the bounded COMPACT form (bench r5's final line, built
    to survive the driver's tail window) carries a {name: [value, unit]}
    'summary' with dotted latency/mfu entries — reconstitute rows from it."""
    if 'rows' in doc:
        return doc['rows']
    if 'summary' in doc:
        rows = {}
        for k, v in doc['summary'].items():
            if '.' not in k and isinstance(v, list) and len(v) == 2:
                rows[k] = {'name': k, 'metric': k, 'value': v[0],
                           'unit': v[1]}
        for k, v in doc['summary'].items():
            if '.' in k:
                name, field = k.split('.', 1)
                if name in rows:
                    rows[name][field] = v
        return list(rows.values())
    return []


def load_rows(path: str):
    """Rows from a bench result: accepts the driver's ``BENCH_r{N}.json``
    wrapper ({"parsed": {...}}), a whole-file bench JSON, or raw bench
    stdout. For raw stdout, prefers the last line carrying full 'rows'
    (the compact summary line printed after it drops per-row detail)."""
    try:
        doc = json.load(open(path))
        if isinstance(doc, dict):
            if isinstance(doc.get('parsed'), dict):
                return _rows_from_doc(doc['parsed'])
            if 'rows' in doc or 'summary' in doc:
                return _rows_from_doc(doc)
            if 'tail' in doc:          # driver wrapper whose parse failed:
                last = None            # scan the captured stdout tail
                for line in str(doc['tail']).splitlines():
                    if line.strip().startswith('{'):
                        try:
                            parsed = json.loads(line)
                        except json.JSONDecodeError:
                            continue
                        if 'rows' in parsed or last is None:
                            last = parsed
                if last is not None:
                    return _rows_from_doc(last)
                raise SystemExit(f'{path}: driver wrapper holds no '
                                 f'parseable bench output (rc='
                                 f'{doc.get("rc")})')
    except json.JSONDecodeError:
        pass
    last_full, last_any = None, None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith('{'):
                try:
                    parsed = json.loads(line)
                except json.JSONDecodeError:
                    continue
                last_any = parsed
                if 'rows' in parsed:
                    last_full = parsed
    if last_full is None and last_any is None:
        raise SystemExit(f'{path}: no parseable JSON line')
    return _rows_from_doc(last_full if last_full is not None else last_any)


def row_key(metric: str) -> str:
    """Stable cross-round identity for a row: the metric string minus the
    parenthesized config notes that legitimately evolve round-to-round."""
    key = re.sub(r'\([^)]*\)', '', metric)
    return re.sub(r'\s+', ' ', key).strip()


# link properties, not server behavior: never diffed as metrics themselves
_LINK_FIELDS = ('tunnel_rtt_ms', 'link_up_MBps', 'link_floor_req_s')


def _link_drift(orow, nrow) -> bool:
    """True when the two rows were measured under very different tunnel
    uplinks (the axon link varies ~5x between sessions, CLAUDE r4) — their
    serving throughput/latency deltas are link noise, not code.

    Falls back to ``link_floor_req_s`` (which the bounded compact bench
    line carries even when ``link_up_MBps`` is dropped): at fixed request
    bytes per mode, floor = link/bytes, so the floor ratio IS the link
    ratio."""
    for field in ('link_up_MBps', 'link_floor_req_s'):
        if field in orow and field in nrow:
            lo, ln = float(orow[field]), float(nrow[field])
            return max(lo, ln) / max(min(lo, ln), 1e-9) > 1.5
    return False


def compare(old_rows, new_rows, tolerance: float):
    # match by the stable short 'name' when both sides carry one (bench r5
    # stamps it); fall back to the normalized metric string for old files
    old_by_name = {r['name']: r for r in old_rows if 'name' in r}
    old_by_metric = {row_key(r['metric']): r for r in old_rows}
    matched = set()
    regressions, lines = [], []
    for nr in new_rows:
        key = nr.get('name') or row_key(nr['metric'])
        orow = old_by_name.get(nr.get('name')) \
            or old_by_metric.get(row_key(nr['metric']))
        if orow is None:
            lines.append(f'  NEW     {key}: {nr["value"]} {nr["unit"]}')
            continue
        matched.add(id(orow))
        drift = _link_drift(orow, nr)
        # the row's value, plus every latency-percentile field present on
        # both sides (lower is better) — a p99 regression with stable req/s
        # must not pass silently (ADVICE r4)
        checks = [('', nr['unit'] in ('ms', 's'),
                   orow.get('value'), nr.get('value'), nr['unit'])]
        for f in sorted(set(nr) & set(orow)):
            if (f.endswith('_ms') and f not in _LINK_FIELDS
                    and isinstance(nr[f], (int, float))
                    and isinstance(orow[f], (int, float))):
                checks.append((f'.{f}', True, orow[f], nr[f], 'ms'))
        for suffix, lower_better, ov, nv, unit in checks:
            ov, nv = float(ov), float(nv)
            if ov == 0:
                continue
            delta = (nv - ov) / abs(ov)
            regressed = delta > tolerance if lower_better \
                else delta < -tolerance
            if regressed and drift:
                lo = orow.get('link_up_MBps',
                              f'floor {orow.get("link_floor_req_s")}')
                ln = nr.get('link_up_MBps',
                            f'floor {nr.get("link_floor_req_s")}')
                lines.append(f'  LINKDRIFT {key}{suffix}: {ov} -> {nv} '
                             f'{unit} ({delta:+.1%}) — uplink changed '
                             f'{lo} -> {ln} MB/s, not comparable')
                continue
            arrow = 'REGRESS' if regressed else ('better ' if (
                delta > 0) != lower_better and abs(delta) > 0.005
                else 'flat   ')
            lines.append(f'  {arrow} {key}{suffix}: {ov} -> {nv} {unit} '
                         f'({delta:+.1%})')
            if regressed:
                regressions.append((f'{key}{suffix}', ov, nv, delta))
    for r in old_rows:
        if id(r) not in matched:
            key = r.get('name') or row_key(r['metric'])
            lines.append(f'  DROPPED {key}')
            regressions.append((key, r['value'], None, None))
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
