"""FID metric parity vs the reference's own mycleanfid code (deterministic
slice): the SAME image files through the reference's resizer + Fréchet
machinery (reference: mycleanfid/fid.py:150-196,431-468) and through our
ieagan_tpu.eval.fid folder pipeline, with a SHARED feature extractor.

Generation-RNG-free, so the tolerance is tight — the residual is PIL
rounding order only. The end-to-end head-to-head including trunc-trick z
generation runs at scale in scripts/fid_parity.py (4000 images; see
docs/VALIDATION.md for the recorded number).
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

REFERENCE = os.environ.get("IEAGAN_REFERENCE", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "mycleanfid")),
    reason="reference repo unavailable")


def _mint_folder(path, n, seed):
    """ADU-like sparse grayscale PNGs (the FID input domain)."""
    from PIL import Image
    rng = np.random.RandomState(seed)
    os.makedirs(path, exist_ok=True)
    for i in range(n):
        img = np.zeros((58, 64), np.float32)
        ys, xs = rng.randint(0, 58, 40), rng.randint(0, 64, 40)
        img[ys, xs] = rng.gamma(2.0, 20.0, 40) + 8
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8),
                        mode="L").save(os.path.join(path, f"{i}.png"))


@pytest.mark.slow
def test_folder_fid_matches_reference_machinery(tmp_path):
    from fid_parity import import_reference_fid
    from ieagan_tpu.eval import fid as fid_mod
    from PIL import Image

    ref_fid = import_reference_fid()
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    _mint_folder(a_dir, 48, seed=0)
    _mint_folder(b_dir, 48, seed=1)

    extractor = fid_mod.FeatureExtractor(seed=0)

    # ---- reference machinery: their PIL mode-F resizer (fid.py:168-196,
    # RGB load + channel-0 resize + /255 as in ResizeDataset, fid.py:280-312)
    # + their scipy-sqrtm frechet_distance (fid.py:431-468)
    resize = ref_fid.build_resizer("clean")

    def ref_folder_feats(fdir):
        feats = []
        for fn in sorted(os.listdir(fdir)):
            rgb = np.array(Image.open(os.path.join(fdir, fn)).convert("RGB"))
            r = resize(rgb)  # (299, 299, 1) float in [0, 255]
            x = np.repeat(r[None] / 255.0, 3, axis=-1)  # broadcast-to-3ch
            feats.append(extractor(x.astype(np.float32)))
        return np.concatenate(feats)

    fa, fb = ref_folder_feats(a_dir), ref_folder_feats(b_dir)
    fid_ref = float(ref_fid.frechet_distance(
        np.mean(fa, 0), np.cov(fa, rowvar=False),
        np.mean(fb, 0), np.cov(fb, rowvar=False)))

    # ---- our pipeline on the same folders, same extractor
    fid_ours = float(fid_mod.compute_fid(
        fdir1=a_dir, fdir2=b_dir, extractor=extractor, batch_size=16))

    rel = abs(fid_ours - fid_ref) / max(abs(fid_ref), 1e-9)
    assert rel < 0.01, (fid_ref, fid_ours, rel)


@pytest.mark.slow
def test_generator_fid_parity_end_to_end(tmp_path):
    """The full north-star gate in miniature: scripts/fid_parity.py in
    shared-z mode (identical torch z/label draws through the reference's
    generation+postprocess+resize+Fréchet AND ours) on CPU fp32, where the
    two implementations are proven numerically identical (docs/
    VALIDATION.md: 0.001% at fp32; 0.24% full-pipeline on a trained G on
    TPU). Subprocess-isolated because the script stubs reference imports."""
    import subprocess
    real_dir = str(tmp_path / "real")
    _mint_folder(real_dir, 200, seed=3)
    env = dict(os.environ, PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "fid_parity.py"),
         "--num-gen", "200", "--num-real", "200", "--shared-z",
         "--host-resize", "--cpu", "--real-dir", real_dir,
         "--stats-dir", str(tmp_path / "stats"), "--tolerance", "0.01"],
        capture_output=True, text=True, timeout=3600, env=env)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    assert "PARITY OK" in proc.stderr, proc.stderr[-2000:]
