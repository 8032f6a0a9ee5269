"""The bench must never again die into an rc=124 timeout corpse
(BENCH_r04): when the tunnel probe reports dead (None) or severely
degraded (>=30s), main() prints the tunnel-health line plus an explicit
skipped-headline artifact and returns — no measurement is attempted."""
import io
import json
import sys

import pytest


@pytest.fixture()
def bench(monkeypatch):
    sys.path.insert(0, "/root/repo")
    import bench as b
    # any attempt to measure after a bail is the bug this test guards
    monkeypatch.setattr(
        b, "bench_train",
        lambda *a, **k: pytest.fail("bench_train ran despite bail"))
    return b


def _run_main(bench, monkeypatch, probe_value):
    monkeypatch.setattr(bench, "probe_tunnel",
                        lambda **k: probe_value)
    out = io.StringIO()
    monkeypatch.setattr(sys, "stdout", out)
    bench.main()
    lines = [json.loads(l) for l in out.getvalue().splitlines()
             if l.startswith("{")]
    return {l["metric"]: l for l in lines}


def test_degraded_tunnel_bails_with_artifact(bench, monkeypatch):
    got = _run_main(bench, monkeypatch, 46.0)
    th = got["tunnel_health_chained_matmul_s"]
    assert th["value"] == 46.0 and th["healthy"] is False
    head = got["r2r_dagger_finetune_episodes_per_sec_per_chip"]
    assert head["skipped"] == "tunnel_degraded"
    assert head["value"] is None
    # provenance, not a fabricated measurement
    assert "ROADMAP" in head["last_verified"]["artifact"]


def test_dead_tunnel_bails_with_artifact(bench, monkeypatch):
    got = _run_main(bench, monkeypatch, None)
    assert got["tunnel_health_chained_matmul_s"]["value"] is None
    head = got["r2r_dagger_finetune_episodes_per_sec_per_chip"]
    assert head["skipped"] == "tunnel_dead"


def test_mild_degradation_proceeds(bench, monkeypatch):
    # 3-30s: numbers are flagged unhealthy but still measured (pre-r5
    # behavior); the bail must NOT fire
    monkeypatch.setattr(bench, "probe_tunnel", lambda **k: 5.0)
    ran = {}
    monkeypatch.setattr(
        bench, "bench_train",
        lambda *a, **k: (ran.setdefault("yes", True),
                         ([1.0, 1.0, 1.0], None))[1])
    monkeypatch.setattr(bench, "bench_decode", lambda *a, **k: 1.0)
    monkeypatch.setattr(bench, "bench_pretrain", lambda *a, **k: {})
    monkeypatch.setenv("GOAT_BENCH_BUDGET", "0")  # skip everything else
    out = io.StringIO()
    monkeypatch.setattr(sys, "stdout", out)
    bench.main()
    assert ran.get("yes")


def test_default_bucket_caps_never_truncate(bench, monkeypatch):
    """The promoted bucket defaults must top out AT each config's gt cap:
    a top cap below it would truncate long supervision paths and change
    the measured workload (bench.build gt_cap per dataset)."""
    monkeypatch.delenv("GOAT_BUCKET", raising=False)
    for (ds, real), gt_cap in bench.GT_CAP.items():
        caps = [int(c) for c in
                bench.default_bucket_caps(ds, real).split(",")]
        assert caps == sorted(caps)
        assert caps[-1] == gt_cap, (ds, real, caps, gt_cap)
    # explicit override wins; empty disables
    monkeypatch.setenv("GOAT_BUCKET", "")
    assert bench.default_bucket_caps("r2r") == ""
    monkeypatch.setenv("GOAT_BUCKET", "4,8")
    assert bench.default_bucket_caps("rxr") == "4,8"
