"""Run the PUBLISHED paper path end-to-end on the synthetic fixture:

    pretrain  ->  train --checkpoint <stage-1 params>  ->  predict

i.e. the reference's pre_train.py -> train.py (strict=False warm start,
train.py:37-39) -> predict.py (bev_txt_pred, predict.py:54-99) chain, through
the real CLI on the TPU chip (VERDICT r4 item 5: the flagship has a 40-epoch
convergence artifact, but the stack-A two-stage pipeline had never been run
end-to-end).

Stage 1 trains the LSS model on the `nuscenes_full` split family (the
reference's datasplit_npre quirk — identical to nu_a2d at mini scale);
stage 2 warm-starts BEV_TXT from the stage-1 params via the loose merge
(encoder/camencode/bevencode subtrees transfer, TXT heads stay fresh) and
trains multitask; predict evaluates the final checkpoint on the test split
at batch 1 and appends the reference's test.txt surface.

Usage: python scripts/run_stacka_chain.py [dataroot] [logroot] [nepochs]
"""
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    dataroot = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synthroot_r5"
    logroot = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stacka_r5"
    nepochs = sys.argv[3] if len(sys.argv) > 3 else "10"

    from lss2_multimodal_nu_tpu.data.splits import create_splits_scenes
    from lss2_multimodal_nu_tpu.data.synthetic import generate

    sp = create_splits_scenes("nu_a2d")
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

    # fixture geometry: 180x320 frames; same relative resize span as the
    # reference's 900x1600 -> 128x352 aug (see run_synth_convergence.py)
    common = [
        "--version", "mini", "--dataroot", dataroot,
        "--bsize", "2", "--dtype", "bfloat16", "--nworkers", "2",
        "--H", "180", "--W", "320", "--resize_lim", "0.965", "1.125",
        "--seed", "0", "--log_every", "8",
    ]
    pre_log = os.path.join(logroot, "pretrain")
    tr_log = os.path.join(logroot, "train")
    os.makedirs(pre_log, exist_ok=True)
    os.makedirs(tr_log, exist_ok=True)

    def run(args):
        cmd = [sys.executable, "-m", "lss2_multimodal_nu_tpu.cli", *args]
        print("exec:", " ".join(cmd), flush=True)
        rc = subprocess.call(cmd)
        if rc != 0:
            raise SystemExit(rc)

    # stage 1: BEV-only pre-training (reference pre_train.py)
    run(["pretrain", *common, "--nepochs", nepochs, "--logdir", pre_log])
    stage1 = os.path.join(pre_log, f"model{int(nepochs) - 1}")

    # stage 2: multitask training warm-started from stage 1 (train.py:37-39)
    run(["train", *common, "--nepochs", nepochs, "--logdir", tr_log,
         "--checkpoint", stage1])
    stage2 = os.path.join(tr_log, f"model{int(nepochs) - 1}")

    # predict: test-split eval at batch 1 (predict.py:54-99)
    run(["predict", *common[:4], *common[6:],  # drop --bsize 2 (predict: 1)
         "--logdir", tr_log, "--checkpoint", stage2,
         "--out_file", os.path.join(logroot, "test.txt")])
    print("chain complete:", logroot, flush=True)


if __name__ == "__main__":
    main()
