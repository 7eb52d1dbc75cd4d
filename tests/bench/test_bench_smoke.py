"""Benchmark harness smoke tests on CPU (SURVEY.md §4.2 item 6):
end-to-end runs with a tiny code, asserting only that sane numbers emerge."""
import json

from ecc_ldpc_tpu.bench.throughput import roofline_mbps, run_benchmark
from ecc_ldpc_tpu.bench.scaling import run_scaling


def test_run_benchmark_smoke():
    r = run_benchmark(
        code="gallager/48/3/6/s5", decoder="minsum/5/noet", batch=32, tries=1
    )
    assert r.throughput_mbps > 0
    assert r.iters == 5 and r.n == 48
    line = json.loads(r.json_line())
    assert line["metric"] == "decoded_throughput"
    assert line["unit"] == "Mbit/s/chip"
    assert 0 < line["vs_baseline"] == round(line["value"] / 1000.0, 4)


def test_benchmark_layered_smoke():
    r = run_benchmark(
        code="80211n/648/12", decoder="layered/norm:0.8125/5/noet",
        batch=32, tries=1,
    )
    assert r.throughput_mbps > 0 and r.k == 324


def test_roofline_formula():
    # doubling iterations halves the memory-bound throughput
    a = roofline_mbps(1000, 500, 25)
    b = roofline_mbps(1000, 500, 50)
    assert abs(a / b - 2.0) < 1e-9


def test_scaling_smoke():
    rows = run_scaling(
        code="gallager/48/3/6/s5", decoder="minsum/5/noet",
        batch_per_device=16, device_counts=[1, 2], chain=2, tries=1,
    )
    assert rows[0]["devices"] == 1 and rows[0]["efficiency"] == 1.0
    assert rows[1]["devices"] == 2 and rows[1]["mbps"] > 0


def test_pipeline_bench_smoke():
    from ecc_ldpc_tpu.bench.pipeline import run_pipeline_benchmark

    r = run_pipeline_benchmark(
        code="80211n/648/12", decoder="layered/norm:0.8125/5/noet",
        batch=32, chain=3, tries=1,
    )
    assert r.encode_mbps > 0 and r.pipeline_mbps > 0
    assert 0.0 <= r.decode_share <= 1.0
    assert r.encode_mbps >= r.pipeline_mbps  # decode can only slow it down


def test_ab_compare_smoke():
    from ecc_ldpc_tpu.bench.ab import ab_compare

    r = ab_compare(
        [("80211n/648/12", "layered/norm:0.8125/5/noet"),
         ("80211n/648/12", "layered/norm:0.8125/10/noet")],
        batch=32, chain=2, reps=2,
    )
    assert len(r.mbps) == 2 and all(m > 0 for m in r.mbps)
    assert r.ratios[0] == 1.0
    # 10 iterations cost more than 5: arm 1 must be slower
    assert r.ratios[1] < 1.0
