"""`cli port` one-shot conversion: all THREE reference checkpoint formats
(train.py:93-95 bare; pre_train_vovnet.py:465-477 component-wise;
train_vovnet_transformer.py:573-594 full-state) -> Orbax params checkpoint,
round-tripped on stub-trunk-generated checkpoints (round-2 VERDICT item 9).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import test_reference_fullmodel_parity as fm  # noqa: E402  (installs the stubs)

from lss2_multimodal_nu_tpu import cli  # noqa: E402
from lss2_multimodal_nu_tpu.train.checkpoint import load_tree  # noqa: E402


@pytest.fixture(scope="module")
def ref_model():
    grid_conf = {
        "xbound": [-16.0, 16.0, 0.5],
        "ybound": [-16.0, 16.0, 0.5],
        "zbound": [-10.0, 10.0, 20.0],
        "dbound": [4.0, 45.0, 1.0],
    }
    data_aug_conf = {
        "final_dim": (64, 176),
        "Ncams": 6,
        "cams": [
            "CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
            "CAM_BACK_LEFT", "CAM_BACK", "CAM_BACK_RIGHT",
        ],
    }
    torch.manual_seed(5)
    return fm.ref_mv.compile_model_vovnet_transformer(
        2, grid_conf, data_aug_conf, outC=4, vovnet_type="vovnet39",
        pretrained=False, lss_version="v2",
        use_camera_attn=True, use_cross_attn=True,
    )


def _port(path, out):
    return cli.main([
        "port", str(path), "--family", "vovnet_transformer", "--out", str(out),
        "--vovnet_type", "vovnet39", "--lss_version", "v2",
        "--version_flags", "V3",
    ])


def test_port_bare_state_dict(ref_model, tmp_path):
    p = tmp_path / "model3.pt"
    torch.save(ref_model.state_dict(), p)
    report = _port(p, tmp_path / "orbax1")
    assert report["format"] == "flat"
    # only the (stubbed) timm trunk is missing; everything else mapped
    assert report["missing"] and all(
        k.startswith("backbone.backbone.") for k in report["missing"]
    )
    # the stub trunk's own keys are reported as unconsumed
    assert any(k.startswith("backbone.backbone.conv") for k in report["unmapped"])

    tree = load_tree(tmp_path / "orbax1")
    got = tree["params"]["bev_encoder"]["transformer"]["encoder"]["linear1"]["kernel"]
    want = ref_model.state_dict()["bev_encoder.transformer.encoder.linear1.weight"]
    np.testing.assert_allclose(got, want.numpy().T)
    # BN running stats land in batch_stats
    assert "bev_encoder" in tree["batch_stats"]


def test_port_component_checkpoint(ref_model, tmp_path):
    p = tmp_path / "best_pretrained.pth"
    torch.save(
        {
            "epoch": 3,
            "lss_version": "v2",
            "backbone_state_dict": ref_model.backbone.state_dict(),
            "depth_net_state_dict": ref_model.depth_net.state_dict(),
            "cam_encode_state_dict": ref_model.cam_encode.state_dict(),
            "bev_encoder_state_dict": ref_model.bev_encoder.state_dict(),
            "optimizer_state_dict": {},
            "miou": 0.5,
        },
        p,
    )
    report = _port(p, tmp_path / "orbax2")
    assert report["format"] == "components"
    assert set(report["components"]) == {
        "backbone", "depth_net", "cam_encode", "bev_encoder",
    }
    # TXT-branch keys are absent from a component checkpoint -> reported
    assert "unified_predictor.action_head.weight" in report["missing"]

    tree = load_tree(tmp_path / "orbax2")
    got = tree["params"]["cam_encode"]["feat_proj"]["kernel"]
    want = ref_model.state_dict()["cam_encode.feat_proj.weight"]
    np.testing.assert_allclose(got, np.transpose(want.numpy(), (2, 3, 1, 0)))
    assert "unified_predictor" not in tree["params"]


def test_port_full_training_state(ref_model, tmp_path):
    p = tmp_path / "best_model_V3.pth"
    torch.save(
        {
            "epoch": 7,
            "model_state_dict": ref_model.state_dict(),
            "optimizer_state_dict": {},
            "scheduler_state_dict": {},
            "scaler_state_dict": {},
            "best_miou": 0.61,
        },
        p,
    )
    report = _port(p, tmp_path / "orbax3")
    assert report["format"] == "full_state"
    assert report["epoch"] == 7 and abs(report["best_miou"] - 0.61) < 1e-9

    tree = load_tree(tmp_path / "orbax3")
    got = tree["params"]["unified_predictor"]["camera_weights"]
    want = ref_model.state_dict()["unified_predictor.camera_weights"]
    np.testing.assert_allclose(got, want.numpy())
