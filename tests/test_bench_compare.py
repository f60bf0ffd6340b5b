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
