"""Factory parity: give_model resolves every reference model_choose string."""

import jax
import pytest

from mm_unet_tpu.models import give_model
from mm_unet_tpu.utils.config import ConfigDict


def _cfg(name, **models_kwargs):
    return ConfigDict(
        trainer=dict(dataset_choose="DRIVE"),
        finetune=dict(model_choose=name, checkpoint=name),
        models=models_kwargs,
    )


@pytest.mark.parametrize("name,section,kwargs", [
    ("UNet", "unet", dict(num_classes=1)),
    ("MM_Net", "MM_Net", dict(num_classes=1)),
    ("UM_Net", "um_net", dict(num_classes=1)),
    ("TransUNet", "trans_unet", dict(class_num=1, img_dim=64)),
    ("CFPNet", "cfp_net", dict(classes=1)),
    ("UNETR", "u_netr", dict(out_channels=1)),
    ("SWINUNETR", "swin_unetr", dict(out_channels=1)),
    ("FCBFormer", "FCBFormer", dict(num_class=1)),
    ("DuAT", "duat", dict(out_channels=1)),
    ("CFANet", "cfa_net", dict(out_class=1)),
    ("PVT_CASCADE", "pvt_ca", dict(o_class=1)),
    ("CVC_UNETR", "cvc_unetr", dict(out_channels=1)),
    ("BMANet", "bmanet", dict(out_channel=1)),
    ("VANet", "vanet", dict(num_class=1)),
    ("dkDualNet", "dkDualNet", dict(out_channels=1)),
    ("ConvUNetXt", "ConvUNetXt", dict(num_classes=1)),
])
def test_give_model_resolves(name, section, kwargs):
    cfg = _cfg(name, **{section: dict(branch1=kwargs)})
    model = give_model(cfg)
    assert model is not None


def test_unknown_model_raises():
    with pytest.raises(ValueError):
        give_model(_cfg("NoSuchModel"))
