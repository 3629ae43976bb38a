"""Unit tests for the slope-verified physics-gate decision logic
(scripts/validate_backend.py::slope_control) against recorded service
behaviors: genuine execution, kill streaks, flat fast-fail bands, and
queue bursts.  Pure logic — run_verify is faked, no TPU or jax.

The protocol exists because the axon service kills long programs
load-dependently and killed programs return in the same 59-175 s band
as fast-failed chains (BASELINE.md round-3 'slope-verified gate
protocol'); these tests pin the acceptance semantics the hardware runs
rely on.
"""

import importlib.util
import os

import pytest

spec = importlib.util.spec_from_file_location(
    "validate_backend",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "validate_backend.py"),
)
vb = importlib.util.module_from_spec(spec)
spec.loader.exec_module(vb)

# slope_control defaults: p_small=1M, p_big=4M, floor=100k, lo=2e-5
S, B4, B2 = 1_000_000, 4_000_000, 2_000_000


def make_run_verify(script):
    """script: list of wall_seconds (or None for a timeout-shaped error)
    returned in call order, tagged executed via the real >=15 s rule."""
    calls = []

    def run_verify(tol, pen, floor=None):
        calls.append((tol, pen, floor))
        if not script:
            return {"wall_seconds": 0.5, "executed": False}
        w = script.pop(0)
        if w is None:
            return None
        return {"wall_seconds": w, "executed": w >= 15.0}

    run_verify.calls = calls
    return run_verify


def test_two_physical_pairs_accept():
    # 1M -> ~66 s, 4M -> ~250 s at the measured ~60 us/layer
    rv = make_run_verify([66.0, 250.0, 70.0, 248.0])
    rec = vb.slope_control(rv)
    assert rec["ok"] is True
    # measured per-layer comes from the weakest accepted pair
    assert rec["per_layer_seconds"] == pytest.approx(178.0 / 3e6)


def test_flat_band_rejects():
    # fast-fail band draws: all walls in 59-175 s but no growth with
    # program size -> two FLAT pairs abort as a dead channel
    rv = make_run_verify([120.0, 130.0, 150.0, 140.0])
    rec = vb.slope_control(rv)
    assert rec["ok"] is False
    assert rec["flat_pairs"] == 2


def test_kill_streak_tolerated_then_accepts():
    # big point dies once (sub-floor walls), pair dropped; the next two
    # pairs are clean -> accept (this run shape lost the first hardware
    # attempt under the rigid S,B,S,B schedule)
    rv = make_run_verify([
        66.0, 0.6, 0.6, 0.6,        # pair 1: S ok, B killed 3x -> drop
        66.0, 250.0,                # pair 2: clean
        70.0, 251.0,                # pair 3: clean
    ])
    rec = vb.slope_control(rv)
    assert rec["ok"] is True


def test_two_dead_big_pairs_shrink_then_accept_at_smaller_size():
    # 4M never executes (kill ceiling between 2M and 4M): two dead-big
    # pairs shrink p_big to 2M and the pair count restarts
    rv = make_run_verify([
        66.0, 0.6, 0.6, 0.6,        # pair 1: B dead
        66.0, 0.6, 0.6, 0.6,        # pair 2: B dead -> shrink to 2M
        66.0, 128.0,                # pair 3 (2M): delta 62 s >= 20 s
        66.0, 126.0,                # pair 4 (2M): delta 60 s
    ])
    rec = vb.slope_control(rv)
    assert rec["ok"] is True
    assert rec["p_big"] == B2
    assert all(pen in (S, B2, B4) for _t, pen, _f in rv.calls)


def test_queue_burst_on_small_fails_safe():
    # a +165 s queue burst on the small point deflates the delta below
    # the physical requirement -> FLAT; one clean pair follows, then a
    # second flat pair aborts: the control never accepts on one pair
    rv = make_run_verify(
        [230.0, 250.0] + [66.0, 250.0] + [120.0, 130.0] * 6
    )
    rec = vb.slope_control(rv)
    assert rec["ok"] is False


def test_kill_band_draw_is_retried_once_speed_is_measured():
    # run C (2026-08-19): a killed 4M-layer program returned 100 s --
    # above the universal 2e-5 floor but far below the session's
    # measured ~61 us/layer physical time -- and flattened the pair.
    # After the first accepted pair the point floor tightens to 0.6x
    # the measured speed, so the band draw is retried instead.
    rv = make_run_verify([
        66.0, 250.0,          # pair 1 clean -> s_est = 184/3M = 61 us
        66.0, 100.0, 251.0,   # pair 2: B=100 < 150 s floor -> retried
    ])
    rec = vb.slope_control(rv)
    assert rec["ok"] is True
    assert rec["flat_pairs"] == 0


def test_inflated_delta_is_a_queue_burst_not_evidence():
    # run D (2026-08-19): a 1483 s queue wall on the big point produced
    # a 1398 s "slope" (25x physical).  Deltas above the per-layer cap
    # are retried -- neither accepted (no fake channel) nor flat (no
    # dead-channel verdict) -- and do not poison the measured-speed
    # floor for later points.
    rv = make_run_verify([
        85.0, 1685.0,         # delta 1600 > cap (3M*5e-4 = 1500 s)
        66.0, 250.0,          # clean pair 1
        70.0, 248.0,          # clean pair 2
    ])
    rec = vb.slope_control(rv)
    assert rec["ok"] is True
    assert rec["per_layer_seconds"] < 1e-4


def test_measured_floor_is_capped():
    # even after accepting a high-but-in-band slope (delta 1434 s ->
    # s_est ~4.8e-4), the point floor never exceeds 2x the universal
    # rate (44 s at 1M layers), so genuine ~66 s small readings are
    # never locked out the way run D's 923 s floor locked them out
    rv = make_run_verify([
        66.0, 1500.0,         # delta 1434, in band -> accepted
        66.0, 250.0,          # genuine small walls must survive
        66.0, 251.0,
    ])
    rec = vb.slope_control(rv)
    assert rec["ok"] is True


def test_forced_penalty_branch_is_requested():
    # every control call must force the penalty branch (tol=-1): a
    # tol that could pass would read the floor, not the penalty
    rv = make_run_verify([66.0, 250.0, 70.0, 248.0])
    vb.slope_control(rv)
    assert all(t == -1.0 for t, _p, _f in rv.calls)


# ---------------------------------------------------------------------------
# differential rung reader (2026-08-19 rework: attempt-1's false fail;
# same-day review: pass votes must be execution-positive -> B/R/F triples)
# ---------------------------------------------------------------------------

RUNG = dict(tol=1e-4, p_big=4_000_000, f=1_000_000, s=4.5e-5)
# floor work f*s = 45 s; signal p_big*s = 180 s; small band |d|<=45;
# large band [90, 540].  Reading order per attempt: B (tol=1e9),
# R (rung tol), F (tol=-1, forced penalty).


def test_diff_rung_genuine_pass():
    # B ~ 45+q, R ~ 45+q (no penalty), F ~ 225+q (penalty executed)
    rv = make_run_verify([60.0, 70.0, 245.0, 100.0, 95.0, 270.0])
    assert vb.rung_diff(rv, **RUNG) == "pass"
    tols = [t for t, _p, _f in rv.calls]
    assert tols == [1e9, 1e-4, -1.0, 1e9, 1e-4, -1.0]


def test_diff_rung_genuine_fail():
    # R fires the same penalty F does: R-B large, F-R ~ 0
    rv = make_run_verify([60.0, 245.0, 250.0, 100.0, 272.0, 280.0])
    assert vb.rung_diff(rv, **RUNG) == "fail"


def test_diff_rung_killed_penalty_cannot_fake_a_pass():
    """THE review scenario: a genuine fail whose long programs get
    service-killed.  R killed to a band draw (small R-B) would have
    faked a pass under the baseline-only reader; with the forced-penalty
    reading, a killed F collapses F-R and the attempt reads chaos."""
    rv = make_run_verify([
        60.0, 62.0, 64.0,     # B genuine, R killed-band, F killed-band
        100.0, 95.0, 101.0,   # same shape again
        60.0, 61.0, 59.0,     # and again -- never a pass vote
        90.0, 92.0, 88.0,
    ])
    assert vb.rung_diff(rv, **RUNG) == "ambiguous"


def test_diff_rung_queue_chaos_retries_then_resolves():
    """Queue bursts/drains read as chaos and are retried; the rung still
    resolves once two clean triples land."""
    rv = make_run_verify([
        128.0, 809.9, 830.0,  # R burst far above both bands -> chaos
        500.0, 130.0, 300.0,  # drain between B and R -> chaos
        90.0, 100.0, 280.0,   # clean pass triple
        60.0, 72.0, 255.0,    # clean pass triple
    ])
    assert vb.rung_diff(rv, **RUNG) == "pass"


def test_diff_rung_contradiction_is_ambiguous():
    rv = make_run_verify([
        60.0, 70.0, 245.0,    # pass vote
        100.0, 280.0, 285.0,  # fail vote -> contradiction
    ])
    assert vb.rung_diff(rv, **RUNG) == "ambiguous"


def test_diff_rung_subfloor_readings_are_retried():
    # kill-band draws BELOW the validity floor are non-executions:
    # retried inside read(), the triple forms from valid readings only
    rv = make_run_verify([0.5, 60.0, 70.0, 250.0, 95.0, 100.0, 282.0])
    assert vb.rung_diff(rv, **RUNG) == "pass"


def test_bisect_slope_end_to_end_certifies(monkeypatch, capsys):
    """Full protocol on a calm-phase script: warm, pre-control, four
    differential rungs (all pass), post-control -> channel_ok=true with
    the 3e-6 upper bracket."""
    import json

    # pre-control measures s = 184 s / 3M ~ 6.13e-5: signal p_big*s ~ 245,
    # small band <= 61, large band [123, 736]
    pass_triple = [60.0, 62.0, 307.0]  # B, R (no penalty), F (executed)
    script = (
        [300.0]                          # warm (compile)
        + [66.0, 250.0, 70.0, 248.0]     # pre-control: 2 physical pairs
        + pass_triple * 8                # 4 rungs x 2 pass triples
        + [68.0, 247.0, 65.0, 251.0]     # post-control: 2 physical pairs
    )
    rv = make_run_verify(list(script))
    monkeypatch.setattr(vb, "_make_run_verify", lambda n: rv)
    vb.bisect_slope(10)
    out = [l for l in capsys.readouterr().out.splitlines()
           if l.startswith("{")][-1]
    rec = json.loads(out)
    assert rec["channel_ok"] is True
    assert rec["max_site_delta_upper"] == 3e-6
    assert rec["max_site_delta_lower"] is None


def test_bisect_slope_end_to_end_brackets_a_fail(monkeypatch, capsys):
    """First rung genuinely fails (every rung reading +p_big*s): ladder
    stops with lower=1e-4, and a live post-control certifies the read."""
    import json

    fail_triple = [60.0, 305.0, 310.0]  # R fires the penalty, F-R ~ 0
    script = (
        [300.0]
        + [66.0, 250.0, 70.0, 248.0]
        + fail_triple * 2               # rung 1e-4: two fail votes
        + [68.0, 247.0, 65.0, 251.0]    # post-control
    )
    rv = make_run_verify(list(script))
    monkeypatch.setattr(vb, "_make_run_verify", lambda n: rv)
    vb.bisect_slope(10)
    out = [l for l in capsys.readouterr().out.splitlines()
           if l.startswith("{")][-1]
    rec = json.loads(out)
    assert rec["channel_ok"] is True
    assert rec["max_site_delta_upper"] is None
    assert rec["max_site_delta_lower"] == 1e-4
