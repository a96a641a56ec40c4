"""Model zoo smoke tests: init + forward shape + finite outputs, mirroring the
reference's per-file `__main__` random-tensor checks (e.g. `MMUNet.py:588-595`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_unet_tpu.models.mm_unet import MM_Net, MMConv, RCG, ResidualBlock
from mm_unet_tpu.models.unet import UNet


def _run(model, x, train=False, **kw):
    # jit init/apply: one XLA compile (persisted in the compilation cache —
    # repeat CI runs hit it) instead of thousands of eager per-op compiles.
    vs = jax.jit(lambda r, x: model.init(r, x, **kw))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x
    )
    if train:
        out, _ = jax.jit(
            lambda vs, x, r: model.apply(
                vs, x, train=True, mutable=["batch_stats"], rngs={"dropout": r}
            )
        )(vs, x, jax.random.key(2))
        return out
    return jax.jit(lambda vs, x: model.apply(vs, x, **kw))(vs, x)


def test_mmconv_shapes():
    m = MMConv(out_channels=16, kernel_size=3, num_slices=4)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 8))  # NHWC submodule
    out = _run(m, x)
    assert out.shape == (2, 8, 8, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_mmconv_k1():
    m = MMConv(out_channels=16, kernel_size=1, num_slices=4)
    x = jax.random.normal(jax.random.key(0), (1, 4, 8, 4))
    out = _run(m, x)
    assert out.shape == (1, 4, 8, 16)


def test_residual_block():
    m = ResidualBlock(16, 32, num_slices=4, downsample=True)
    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 16))
    out = _run(m, x)
    assert out.shape == (1, 4, 4, 32)


def test_rcg():
    m = RCG(num_slices=4)
    pre = jax.random.normal(jax.random.key(0), (1, 8, 8, 1))
    edge = jax.random.normal(jax.random.key(1), (1, 16, 16, 64))
    f = jax.random.normal(jax.random.key(2), (1, 8, 8, 64))
    vs = jax.jit(m.init)(jax.random.key(3), pre, edge, f)
    out = jax.jit(m.apply)(vs, pre, edge, f)
    assert out.shape == (1, 8, 8, 64)


@pytest.mark.slow
def test_mm_net_forward():
    model = MM_Net(num_classes=1, remat=False)
    x = jax.random.normal(jax.random.key(0), (1, 3, 128, 128))
    out = _run(model, x)
    assert out.shape == (1, 1, 128, 128)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_forward():
    model = UNet(num_classes=1)
    x = jax.random.normal(jax.random.key(0), (1, 3, 64, 64))
    out = _run(model, x)
    assert out.shape == (1, 1, 64, 64)
    out_t = _run(model, x, train=True)
    assert out_t.shape == (1, 1, 64, 64)


@pytest.mark.slow
def test_transunet_forward():
    from mm_unet_tpu.models.transunet import TransUNet

    model = TransUNet(img_dim=64, out_channels=32, head_num=4, mlp_dim=128,
                      block_num=2, patch_dim=16, class_num=1)
    x = jax.random.normal(jax.random.key(0), (1, 3, 64, 64))
    out = _run(model, x)
    assert out.shape == (1, 1, 64, 64)


@pytest.mark.slow
def test_convunext_forward():
    from mm_unet_tpu.models.convunext import ConvUNeXt

    model = ConvUNeXt(num_classes=1, base_c=16)
    x = jax.random.normal(jax.random.key(0), (1, 3, 64, 64))
    out = _run(model, x)
    assert out.shape == (1, 1, 64, 64)


@pytest.mark.slow
def test_cfpnet_forward():
    from mm_unet_tpu.models.cfpnet import CFPNet

    model = CFPNet(classes=1)
    x = jax.random.normal(jax.random.key(0), (1, 3, 64, 64))
    out = _run(model, x)
    assert out.shape == (1, 1, 64, 64)


def test_dsconv_both_morphs():
    from mm_unet_tpu.models.dsconv import DSConv

    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 8))
    for morph in (0, 1):
        out = _run(DSConv(out_channels=16, kernel_size=3, morph=morph), x)
        assert out.shape == (1, 8, 8, 16)


@pytest.mark.slow
def test_um_net_forward():
    from mm_unet_tpu.models.um_net import UM_Net

    model = UM_Net(num_classes=1)
    x = jax.random.normal(jax.random.key(0), (1, 3, 128, 128))
    out = _run(model, x)
    assert out.shape == (1, 1, 128, 128)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_pvtv2_pyramid():
    from mm_unet_tpu.models.pvtv2 import PVTv2

    m = PVTv2(embed_dims=(16, 32, 48, 64), num_heads=(1, 2, 3, 4), depths=(1, 1, 1, 1))
    x = jax.random.normal(jax.random.key(0), (1, 64, 64, 3))
    vs = m.init(jax.random.key(1), x)
    pyr = m.apply(vs, x)
    assert [p.shape for p in pyr] == [(1, 16, 16, 16), (1, 8, 8, 32), (1, 4, 4, 48), (1, 2, 2, 64)]


@pytest.mark.slow
def test_fcbformer_forward():
    from mm_unet_tpu.models.fcbformer import FCBFormer

    model = FCBFormer(size=64, num_class=1)
    x = jax.random.normal(jax.random.key(0), (1, 3, 64, 64))
    out = _run(model, x)
    assert out.shape == (1, 1, 64, 64)


@pytest.mark.slow
def test_duat_forward():
    from mm_unet_tpu.models.duat import DuAT

    model = DuAT(out_channels=1)
    x = jax.random.normal(jax.random.key(0), (1, 3, 64, 64))
    out = _run(model, x)
    assert out.shape == (1, 1, 64, 64)


@pytest.mark.slow
def test_unetr_forward():
    from mm_unet_tpu.models.unetr import UNETR

    model = UNETR(out_channels=1, img_size=64, feature_size=16, hidden_size=96,
                  mlp_dim=192, num_heads=4)
    x = jax.random.normal(jax.random.key(0), (1, 3, 64, 64))
    out = _run(model, x)
    assert out.shape == (1, 1, 64, 64)


@pytest.mark.slow
def test_swin_unetr_forward():
    from mm_unet_tpu.models.swin_unetr import SwinUNETR

    model = SwinUNETR(out_channels=1, feature_size=12, use_checkpoint=False)
    x = jax.random.normal(jax.random.key(0), (1, 3, 64, 64))
    out = _run(model, x)
    assert out.shape == (1, 1, 64, 64)


@pytest.mark.slow
def test_cfanet_forward():
    from mm_unet_tpu.models.cfanet import CFANet

    model = CFANet(out_class=1, channel=64)
    x = jax.random.normal(jax.random.key(0), (1, 3, 64, 64))
    out = _run(model, x)
    assert out.shape == (1, 1, 64, 64)


@pytest.mark.slow
def test_dkdualnet_forward():
    from mm_unet_tpu.models.dkdualnet import dkDualNet

    model = dkDualNet(out_channels=1, dims=(16, 32, 64, 128), num_slices_list=(4, 4, 2, 2))
    x = jax.random.normal(jax.random.key(0), (1, 3, 64, 64))
    out = _run(model, x)
    assert out.shape == (1, 1, 64, 64)


@pytest.mark.slow
def test_pvt_cascade_forward():
    from mm_unet_tpu.models.pvt_cascade import PVT_CASCADE

    model = PVT_CASCADE(o_class=1)
    x = jax.random.normal(jax.random.key(0), (1, 3, 64, 64))
    out = _run(model, x)
    assert out.shape == (1, 1, 64, 64)


@pytest.mark.slow
def test_cvc_unetr_forward():
    from mm_unet_tpu.models.cvc_unetr import CVC_Unetr

    model = CVC_Unetr(out_channels=1)
    x = jax.random.normal(jax.random.key(0), (1, 3, 64, 64))
    out = _run(model, x)
    assert out.shape == (1, 1, 64, 64)


@pytest.mark.slow
def test_bmanet_forward():
    from mm_unet_tpu.models.bmanet import BMANet

    model = BMANet(out_channel=1)
    x = jax.random.normal(jax.random.key(0), (1, 3, 64, 64))
    out = _run(model, x)
    assert out.shape == (1, 1, 64, 64)
    vals = np.asarray(out)
    assert (vals >= 0).all() and (vals <= 1).all()  # sigmoid-before-upsample


@pytest.mark.slow
def test_vanet_forward():
    from mm_unet_tpu.models.vanet import VANet

    model = VANet(num_class=1, depths=(1, 2, 2), embed_dims=(32, 64, 96),
                  num_heads=(1, 2, 3))
    x = jax.random.normal(jax.random.key(0), (1, 3, 64, 64))
    out = _run(model, x)
    assert out.shape == (1, 1, 64, 64)


@pytest.mark.slow
def test_hwaunetr_forward():
    from mm_unet_tpu.models.hwaunetr import HWAUNETR

    model = HWAUNETR(in_chans=3, out_chans=1, dims=(16, 32, 48, 64),
                     num_slices_list=(4, 4, 2, 2))
    x = jax.random.normal(jax.random.key(0), (1, 3, 64, 64))
    out = _run(model, x)
    assert out.shape == (1, 1, 64, 64)


def test_mm_net_validate_input_size():
    """STARE-704 analysis (VERDICT r2 item 10): the reference's default slice
    list is infeasible at 704² (stage-5: 484 % 8 != 0 would crash its
    xz.chunk/stack); (64, 32, 16, 4) divides every stage."""
    import pytest as _pytest

    from mm_unet_tpu.models.mm_unet import validate_input_size

    assert validate_input_size(512, 512) == [16384, 4096, 1024, 256]
    with _pytest.raises(ValueError, match="stage 5.*484"):
        validate_input_size(704, 704)
    assert validate_input_size(704, 704, (64, 32, 16, 4)) == [30976, 7744, 1936, 484]
    with _pytest.raises(ValueError, match="divisible by 32"):
        validate_input_size(700, 700)
