"""Perf-regression guard: tools/bench_compare.py on real round artifacts."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))
import bench_compare  # noqa: E402

REPO = os.path.join(os.path.dirname(__file__), '..')


def test_loads_driver_wrapper():
    rows = bench_compare.load_rows(os.path.join(REPO, 'BENCH_r03.json'))
    assert len(rows) >= 10
    assert all('metric' in r and 'value' in r for r in rows)


def test_r3_vs_itself_is_clean(capsys):
    path = os.path.join(REPO, 'BENCH_r03.json')
    rc = bench_compare.main([path, path])
    assert rc == 0
    assert 'no regressions' in capsys.readouterr().out


def test_detects_throughput_regression(tmp_path):
    old = {'rows': [{'metric': 'm clips/sec', 'value': 100.0,
                     'unit': 'clips/s'}]}
    new = {'rows': [{'metric': 'm clips/sec', 'value': 80.0,
                     'unit': 'clips/s'}]}
    po, pn = tmp_path / 'o.json', tmp_path / 'n.json'
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    assert bench_compare.main([str(po), str(pn)]) == 1
    # within tolerance passes
    new['rows'][0]['value'] = 95.0
    pn.write_text(json.dumps(new))
    assert bench_compare.main([str(po), str(pn)]) == 0


def test_latency_direction_and_dropped_rows(tmp_path):
    old = {'rows': [{'metric': 'kernel ms/iter', 'value': 3.0, 'unit': 'ms'},
                    {'metric': 'gone', 'value': 1.0, 'unit': 'x/s'}]}
    new = {'rows': [{'metric': 'kernel ms/iter', 'value': 4.0, 'unit': 'ms'}]}
    po, pn = tmp_path / 'o.json', tmp_path / 'n.json'
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    # higher ms = regression, and the dropped row also fails the run
    regs, _ = bench_compare.compare(old['rows'], new['rows'], 0.10)
    assert {r[0] for r in regs} == {'kernel ms/iter', 'gone'}


def test_config_notes_do_not_break_matching():
    k1 = bench_compare.row_key('slowfast 64f (s2d stems) clips/sec')
    k2 = bench_compare.row_key('slowfast 64f (fold-4 fast stem) clips/sec')
    assert k1 == k2


def test_latency_percentile_fields_are_diffed():
    """A p99 regression with stable req/s must fail the guard (ADVICE r4:
    exactly the r3 head-of-line bug would have passed silently)."""
    old = [{'metric': 'serving req/sec', 'name': 'serving', 'value': 50.0,
            'unit': 'req/s', 'p50_ms': 35.0, 'p99_ms': 41.0}]
    new = [{'metric': 'serving req/sec', 'name': 'serving', 'value': 50.0,
            'unit': 'req/s', 'p50_ms': 36.0, 'p99_ms': 900.0}]
    regs, lines = bench_compare.compare(old, new, 0.10)
    assert {r[0] for r in regs} == {'serving.p99_ms'}
    # tunnel_rtt_ms is a link property, never a diffed metric
    old[0]['tunnel_rtt_ms'] = 10.0
    new[0]['tunnel_rtt_ms'] = 500.0
    new[0]['p99_ms'] = 41.0
    regs, _ = bench_compare.compare(old, new, 0.10)
    assert regs == []


def test_link_drift_suppresses_serving_regression():
    """Serving rows measured under a ~5x-different tunnel uplink are not
    comparable (CLAUDE r4): the delta is reported as LINKDRIFT, not a
    failure — but with a STABLE link the same delta still fails."""
    old = [{'metric': 'serving req/sec', 'name': 'serving', 'value': 50.0,
            'unit': 'req/s', 'p99_ms': 41.0, 'link_up_MBps': 67.0}]
    new = [{'metric': 'serving req/sec', 'name': 'serving', 'value': 12.0,
            'unit': 'req/s', 'p99_ms': 200.0, 'link_up_MBps': 13.0}]
    regs, lines = bench_compare.compare(old, new, 0.10)
    assert regs == []
    assert any('LINKDRIFT' in ln for ln in lines)
    new[0]['link_up_MBps'] = 66.0          # same-session link: real regress
    regs, _ = bench_compare.compare(old, new, 0.10)
    assert {r[0] for r in regs} == {'serving', 'serving.p99_ms'}


def test_link_drift_falls_back_to_floor_field():
    """The bounded compact line drops link_up_MBps but keeps
    link_floor_req_s; at fixed request bytes the floor ratio IS the link
    ratio, so drift suppression must still engage against compact-derived
    baselines (the driver's BENCH_r{N}.json holds exactly that form)."""
    old = [{'metric': 'serving req/sec', 'name': 'serving', 'value': 47.7,
            'unit': 'req/s', 'p99_ms': 225.0, 'link_floor_req_s': 59.2}]
    new = [{'metric': 'serving req/sec', 'name': 'serving', 'value': 17.0,
            'unit': 'req/s', 'p99_ms': 700.0, 'link_floor_req_s': 21.0}]
    regs, lines = bench_compare.compare(old, new, 0.10)
    assert regs == []
    assert any('LINKDRIFT' in ln for ln in lines)
    new[0]['link_floor_req_s'] = 58.0     # stable link: real regression
    regs, _ = bench_compare.compare(old, new, 0.10)
    assert {r[0] for r in regs} == {'serving', 'serving.p99_ms'}


def test_loads_compact_summary_line(tmp_path):
    """The bounded final line bench prints (summary map, no rows) must be
    loadable — it is all the driver's tail window is guaranteed to hold."""
    compact = {'metric': 'resnet3d50 clips/sec', 'value': 1142.7,
               'unit': 'clips/s', 'vs_baseline': 11.4,
               'summary': {'resnet3d50': [1142.7, 'clips/s'],
                           'resnet3d50.mfu': 0.438,
                           'serving': [54.2, 'req/s'],
                           'serving.p99_ms': 41.0,
                           'serving.link_floor_req_s': 48.9},
               'notes_n': 0}
    p = tmp_path / 'compact.json'
    p.write_text(json.dumps({'parsed': compact}))
    rows = {r['name']: r for r in bench_compare.load_rows(str(p))}
    assert rows['resnet3d50']['value'] == 1142.7
    assert rows['resnet3d50']['mfu'] == 0.438
    assert rows['serving']['p99_ms'] == 41.0
    # name-keyed rows match against old metric-keyed rows by name too
    old = [{'metric': 'serving whatever req/sec', 'name': 'serving',
            'value': 54.0, 'unit': 'req/s', 'p99_ms': 40.0}]
    regs, _ = bench_compare.compare(old, list(rows.values()), 0.10)
    assert regs == []
