"""Run the stack-B two-stage pipeline end-to-end on the synthetic fixture:

    pretrain-v2  ->  train-v2 (DEFAULT component warm start)

i.e. the reference's pre_train_vovnet.py -> train_vovnet_transformer.py chain
(train_vovnet_transformer.py:428-449 loads --pretrained_path, default
./pretrain_vovnet/best_pretrained.pth, unless --no_pretrained), through the
real CLI on the TPU chip. Uses the reference defaults where they matter:
lss_version v1 on both stages (pre_train_vovnet.py:301,
train_vovnet_transformer.py:40), best COMPONENT checkpoint from stage 1
consumed by stage 2 WITHOUT --checkpoint — the default-path wiring is what
this chain proves.

Usage: python scripts/run_stackb_chain.py [dataroot] [logroot] [nepochs]
"""
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    dataroot = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synthroot_r5"
    logroot = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stackb_r5"
    nepochs = sys.argv[3] if len(sys.argv) > 3 else "6"

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

    common = [
        "--version", "mini", "--dataroot", dataroot,
        "--bsize", "2", "--dtype", "bfloat16", "--nworkers", "2",
        "--H", "180", "--W", "320", "--resize_lim", "0.965", "1.125",
        "--seed", "0", "--log_every", "8",
        # short-chain cadence: validate every 2 epochs (reference: 5) so the
        # best checkpoints actually materialize in a few-epoch smoke
        "--eval_every", "2", "--ckpt_every", str(int(nepochs)),
    ]
    pre_log = os.path.join(logroot, "pretrain_vovnet")
    tr_log = os.path.join(logroot, "train_v2")
    os.makedirs(pre_log, exist_ok=True)
    os.makedirs(tr_log, exist_ok=True)

    def run(args):
        cmd = [sys.executable, "-m", "lss2_multimodal_nu_tpu.cli", *args]
        print("exec:", " ".join(cmd), flush=True)
        rc = subprocess.call(cmd)
        if rc != 0:
            raise SystemExit(rc)

    # stage 1: VoVNet+LSS BEV pre-training (pre_train_vovnet.py)
    run(["pretrain-v2", *common, "--nepochs", nepochs, "--logdir", pre_log])
    best = os.path.join(pre_log, "best_pretrained")
    assert os.path.isdir(best), "stage 1 did not write best_pretrained"

    # stage 2: full transformer model, DEFAULT warm start from stage 1
    # (no --checkpoint; --pretrained_path only redirects the default lookup)
    run(["train-v2", *common, "--nepochs", nepochs, "--logdir", tr_log,
         "--pretrained_path", best])
    assert os.path.isdir(os.path.join(tr_log, "best_model_V3")), \
        "stage 2 did not write best_model_V3"
    print("chain complete:", logroot, flush=True)


if __name__ == "__main__":
    main()
