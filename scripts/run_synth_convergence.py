"""Reproduce the synthetic-data convergence artifact (artifacts/synth_convergence).

Generates the LEARNABLE ground-plane fixture (data/synthetic.py) and trains
the flagship through the real CLI on the TPU chip. The fixture renders
180x320 camera JPEGs; --resize_lim is scaled so the train-time crop geometry
matches the reference's relative span (newH/fH in (1.36, 1.58),
reference tools.py:118-142 at 900x1600 -> final 128x352), and the eval path's
deterministic resize = max(128/180, 352/320) = 1.1 keeps crops in-bounds.

Usage: python scripts/run_synth_convergence.py [dataroot] [logdir] [nepochs]
"""
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    dataroot = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synthroot_r4"
    logdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/synthrun_r4"
    # 40 epochs: the sparse classes (vehicles ~0.8% of pixels) need the
    # longer schedule — vehicle IoU is still climbing at epoch 16
    nepochs = sys.argv[3] if len(sys.argv) > 3 else "40"

    from lss2_multimodal_nu_tpu.data.splits import create_splits_scenes
    from lss2_multimodal_nu_tpu.data.synthetic import generate

    sp = create_splits_scenes("nu_a2d")
    # the CLI joins --dataroot with the version directory (cli._loaders)
    fixture_root = os.path.join(dataroot, "mini")
    if not os.path.exists(os.path.join(fixture_root, "v1.0-mini")):
        generate(
            fixture_root,
            scenes=sp["mini_train"] + sp["mini_val"],
            samples_per_scene=12,
            img_hw=(180, 320),
            seed=7,
        )
        print("fixture generated:", dataroot, flush=True)

    cmd = [
        sys.executable, "-m", "lss2_multimodal_nu_tpu.cli", "train-v2",
        # pin the flagship config (the CLI defaults follow the reference:
        # lss_version v1 + a stage-1 warm-start lookup we don't want here)
        "--lss_version", "v2", "--version_flags", "V3", "--no_pretrained",
        "--version", "mini", "--dataroot", dataroot,
        "--nepochs", nepochs, "--bsize", "2", "--dtype", "bfloat16",
        "--logdir", logdir, "--nworkers", "2",
        "--H", "180", "--W", "320", "--resize_lim", "0.965", "1.125",
        "--seed", "0", "--log_every", "8",
    ]
    print("exec:", " ".join(cmd), flush=True)
    os.makedirs(logdir, exist_ok=True)
    raise SystemExit(subprocess.call(cmd))


if __name__ == "__main__":
    main()
