"""The committed quality-evidence tree (results/) backs BASELINE.md's
claims (VERDICT r2 weak #3: outputs/ is transient, so every claim's
small evidence is snapshotted via tools/snapshot_result.py and the
claims themselves are locked here)."""
import json
import os

import pytest

ROOT = os.path.join(os.path.dirname(__file__), os.pardir, "results")


def _load(name, fname="eval.json"):
    path = os.path.join(ROOT, name, fname)
    if not os.path.exists(path):
        pytest.fail(f"missing committed evidence: results/{name}/{fname}")
    with open(path) as f:
        return json.load(f)


def test_snapshots_are_complete():
    """Every snapshot has config + eval + train-log tail."""
    names = [n for n in os.listdir(ROOT)
             if os.path.isdir(os.path.join(ROOT, n))]
    assert names, "results/ tree is empty"
    for n in names:
        for fname in ("config.json", "eval.json", "train_log_tail.jsonl"):
            assert os.path.exists(os.path.join(ROOT, n, fname)), (n, fname)


def test_eval_metric_keys_are_reference_complete():
    """Committed evals carry the reference metric-key set
    (reflect_sampling_nerf_model.py:474-480; lpips only when weights
    exist, coarse_psnr null-with-note in proposal mode)."""
    for n in os.listdir(ROOT):
        ev = _load(n)
        for k in ("psnr", "fine_psnr", "fine_ssim", "coarse_psnr"):
            assert k in ev, (n, k)


def test_eval_metrics_are_physically_sane():
    """VERDICT r3 weak #2: a corrupted snapshot (fine_ssim 2.889 from
    the pre-fix bf16 SSIM convs) sailed through the key-presence check.
    Every committed metric must be physically possible: SSIM in [0, 1],
    PSNR positive and below any real render's ceiling."""
    for n in os.listdir(ROOT):
        ev = _load(n)
        for k, v in ev.items():
            if v is None:
                continue  # null-with-note (proposal-mode coarse_psnr)
            if "ssim" in k:
                assert 0.0 <= v <= 1.0, (n, k, v)
            elif "psnr" in k:
                assert 0.0 < v < 60.0, (n, k, v)
            elif "lpips" in k:
                assert 0.0 <= v <= 1.0, (n, k, v)


def test_propreflect_ab_backs_the_preset_flip():
    """BASELINE.md r3 row: proposal-for-reflect was adopted because the
    30k A/B scored HIGHER PSNR than the control arm (+1.1 dB)."""
    ctrl = _load("ab30k-ctrl")
    pr = _load("ab30k-propreflect")
    assert pr["fine_psnr"] > ctrl["fine_psnr"] + 0.5
    # and the arms really differ only in the flag under test
    c_cfg = _load("ab30k-ctrl", "config.json")
    p_cfg = _load("ab30k-propreflect", "config.json")
    assert c_cfg["pipeline"]["model"]["use_proposal_reflect"] is False
    assert p_cfg["pipeline"]["model"]["use_proposal_reflect"] is True
    c_cfg["pipeline"]["model"]["use_proposal_reflect"] = True
    c_cfg["experiment_name"] = p_cfg["experiment_name"]
    assert c_cfg == p_cfg


def test_specular_12cam_data_starvation_observation():
    """Recorded NEGATIVE result (BASELINE.md r3): on the 12-cam/64^2
    mirror scene the full reflection model UNDERPERFORMS primary-only
    mipnerf — it fits train RGB (loss_mid_fine 0.0014) but its normals
    never become multi-view consistent (predicted_normal_loss 0.29
    dominates the total), so reflection directions are wrong at eval.
    The scene needs enough views to pin geometry; the margin claims
    live on the 48-cam runs below."""
    mip = _load("spec30k-mipnerf")
    par = _load("spec30k-parity")
    assert mip["fine_psnr"] > par["fine_psnr"]  # the observation itself


def test_specular_48cam_mirror_negative_observation():
    """Recorded NEGATIVE result #2 (BASELINE.md r3): even at 48 cams @
    96^2 the NEAR-PERFECT mirror (diffuse 0.04) defeats the reflection
    model — there is no diffuse anchor, so the density field "fakes"
    reflections and analytic normals stay multi-view inconsistent; the
    fine (reflected) pass scores BELOW its own coarse pass and below
    primary-only mipnerf.  This is the known hard case for the whole
    Ref-NeRF family, not an rsn defect; the subsystem's positive
    benchmark is the glossy scene below (the reference's actual
    shiny-Blender-style target domain)."""
    mip = _load("spec48c30k-mipnerf")
    par = _load("spec48c30k-parity")
    assert mip["fine_psnr"] > par["fine_psnr"]  # the observation
    assert par["coarse_psnr"] > par["fine_psnr"]  # reflected pass hurts


def test_glossy_sphere_marginal_observation():
    """Recorded MARGINAL result (BASELINE.md r4, 48 cams @ 96^2): the
    glossy SPHERE (textured diffuse anchor + 0.45 tint) softens but
    does not cure the curved-surface pathology — parity edges out
    mipnerf (+0.19 dB, below any honest margin) while its fine pass
    still scores below its own coarse pass (reflected directions off:
    ~60 deg mean pred-vs-analytic normal disagreement at convergence).
    The obstacle is CURVATURE, not texture; the subsystem's positive
    benchmark is the flat-floor scene (test below)."""
    mip = _load("glossy30k-mipnerf")
    par = _load("glossy30k-parity")
    pre = _load("glossy30k-preset")
    assert par["fine_psnr"] >= mip["fine_psnr"], (par, mip)  # no loss
    assert par["coarse_psnr"] > par["fine_psnr"]  # pathology persists
    assert pre["fine_psnr"] < mip["fine_psnr"] + 0.5  # preset: marginal


def test_shinyfloor_dense_views_observation():
    """Recorded r4 result (48 cams @ 96^2, corrected tint semantics):
    on the flat glossy floor the 4-pass model's COARSE pass (29.80)
    beats primary-only mipnerf's best image (28.80) — reflected-ray
    supervision strictly improves the shared field — while the
    reflected COMPOSITE (the reference's product image) still pays a
    per-ray estimator-noise penalty vs its own coarse and loses to
    mipnerf at this view density: 48 views 7.5 deg apart let a
    position-conditioned view-dependent-texture model interpolate the
    reflections, so the composite's noise has nothing to buy back.
    The sparse-view A/B below is the regime the machinery exists for."""
    mip = _load("shiny30000-mipnerf")
    par = _load("shiny30000-parity")
    pre = _load("shiny30000-preset")
    assert par["coarse_psnr"] > mip["fine_psnr"] + 0.5, (par, mip)
    assert mip["fine_psnr"] > par["fine_psnr"]  # the observation
    assert abs(pre["fine_psnr"] - par["fine_psnr"]) < 1.0  # scheme-indep


def test_shinyfloor_sparse_views_saturation_observation():
    """Recorded r4 observation (20 cams @ 96^2, 18 deg apart, eval
    midway between train views): sparsifying views made the
    primary-only baseline STRONGER, not weaker (29.57 vs 28.80 at 48
    cams) — fewer images to fit, and the reflections stay smooth
    enough in angle to interpolate.  The interpolation-ghosting
    hypothesis is dead on this scene class: these procedural
    benchmarks are SATURATED for the product-metric contest (a
    0.62M-param position-conditioned view-dependent model can fit
    them outright), so the parity sparse leg was not run.  The
    subsystem's demonstrated value on procedural scenes is the
    dense-view coarse-pass result (+1.0 dB, test above); a
    product-metric win requires the reference's real target data
    (shiny Blender), absent in this environment."""
    mip_sparse = _load("shiny20c30k-mipnerf")
    mip_dense = _load("shiny30000-mipnerf")
    assert mip_sparse["fine_psnr"] > mip_dense["fine_psnr"]  # saturation


def test_conv30k_r5_refresh_backs_headline():
    """r5 quality-ladder refresh under corrected tint semantics
    (VERDICT r4 #3): the bench headline's quality-parity justification
    cites these two post-fix runs.  The preset must be >= the
    reference-default scheme on the product metric (observed +0.55 dB),
    replacing the stale pre-tint-fix 23.59-vs-23.6 citation."""
    parity = _load("conv30k-parity-r5")
    preset = _load("conv30k-preset-r5")
    assert 22.5 < parity["fine_psnr"] < 24.0, parity
    assert 23.0 < preset["fine_psnr"] < 24.5, preset
    assert preset["fine_psnr"] >= parity["fine_psnr"], (preset, parity)
    # coarse-over-fine on the parity scheme (the composite estimator-
    # noise penalty, BASELINE.md shinyfloor analysis) shows here too
    assert parity["coarse_psnr"] > parity["fine_psnr"]


def test_extrapolated_view_observation():
    """r5 extrapolated-view benchmark (VERDICT r4 #4): eval cameras
    OUTSIDE the training elevation band.  Locks the three findings in
    BASELINE.md: (1) primary-only degrades MOST out-of-band (its
    view-dependent-texture reflections must extrapolate); (2) the
    4-pass coarse beats primary-only's best out-of-band too (the
    reflected-supervision positive persists); (3) the product metric
    stays negative — the composite's estimator-noise penalty still
    exceeds the extrapolation advantage on this scene class."""
    mip = _load("extrap30000-mipnerf")
    par = _load("extrap30000-parity")
    pre = _load("extrap30000-preset")
    # in-band r4 references: mipnerf 28.80, parity fine 26.25
    assert mip["fine_psnr"] < 26.0, mip   # lost >= ~3 dB out-of-band
    # (1) absolute degradation: mipnerf drops more than the composite
    drop_mip = 28.80 - mip["fine_psnr"]
    drop_par = 26.25 - par["fine_psnr"]
    assert drop_mip > drop_par, (drop_mip, drop_par)
    # (2) the 4-pass coarse beats primary-only's best image
    assert par["coarse_psnr"] > max(mip["fine_psnr"], mip["coarse_psnr"]) \
        - 0.3, (par, mip)
    # (3) the product metric remains negative (honest record)
    assert par["fine_psnr"] < mip["fine_psnr"]
    assert pre["fine_psnr"] < mip["fine_psnr"]
