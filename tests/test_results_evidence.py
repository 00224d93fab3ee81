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


def test_glossy_ab_backs_the_reflection_subsystem():
    """BASELINE.md r3 glossy rows (48 cams @ 96^2): on the glossy
    scene (textured diffuse anchor + 0.45 reflective tint over
    near-field reflected content) the reflection-aware models must
    beat the primary-only 'mipnerf' family (the method's namesake
    machinery earns its cost), and the recommended preset must hold
    quality parity with the reference-default scheme where reflections
    matter."""
    if not os.path.exists(os.path.join(ROOT, "glossy30k-preset")):
        pytest.skip("glossy A/B snapshots not yet committed")
    mip = _load("glossy30k-mipnerf")
    par = _load("glossy30k-parity")
    pre = _load("glossy30k-preset")
    assert par["fine_psnr"] > mip["fine_psnr"] + 0.5, (par, mip)
    assert pre["fine_psnr"] > mip["fine_psnr"] + 0.5, (pre, mip)
    # preset-vs-parity: parity within 1 dB on the glossy scene
    assert abs(pre["fine_psnr"] - par["fine_psnr"]) < 1.0, (pre, par)
