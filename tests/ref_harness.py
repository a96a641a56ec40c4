"""Harness for golden-parity tests against the ACTUAL reference source at
/root/reference (torch CPU).

The reference's fast paths call CUDA extension modules; its own pure-torch
fallbacks (`selective_scan_ref`, `causal_conv1d_ref`,
`/root/reference/requirements/Mamba/mamba/mamba_ssm/ops/selective_scan_interface.py:86-152`,
`.../causal-conv1d/causal_conv1d/causal_conv1d_interface.py:49-65`) are exact
references for those kernels. This module:

1. injects empty stub modules for `selective_scan_cuda` / `causal_conv1d_cuda`
   so the reference interface files import on CPU,
2. loads the reference's OWN interface files by path and rebinds their fast
   entry points to their own `*_ref` implementations,
3. fabricates a `mamba_ssm` package whose `Mamba` is the reference's modified
   module (`/root/reference/requirements/mamba_simple.py`, the file README.md
   says to install over the stock one) running entirely on the pure-torch
   refs, plus minimal `timm`/`torchvision` stubs,

so reference model files (`src/UM_Net/MMUNet.py`, the zoo) import and run
unmodified — the strongest Dice-parity proxy available without datasets.

Everything is lazy and import-guarded: tests using this module must
`pytest.importorskip("torch")` and check `HAVE_REFERENCE`.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

REF = "/root/reference"
HAVE_REFERENCE = os.path.isdir(os.path.join(REF, "src"))

_SS_PATH = os.path.join(
    REF, "requirements/Mamba/mamba/mamba_ssm/ops/selective_scan_interface.py"
)
_CC_PATH = os.path.join(
    REF, "requirements/Mamba/causal-conv1d/causal_conv1d/causal_conv1d_interface.py"
)
_MAMBA_PATH = os.path.join(REF, "requirements/mamba_simple.py")

_installed = False


def _load_by_path(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _stub_module(name: str, **attrs):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def causal_conv1d_update_ref(x, conv_state, weight, bias=None, activation=None):
    """Pure-torch mirror of the reference `_causal_conv1d_update_ref`
    (`causal-conv1d/tests/test_causal_conv1d.py`): in-place rolling state."""
    import torch
    import torch.nn.functional as F

    conv_state.copy_(torch.roll(conv_state, shifts=-1, dims=-1))
    conv_state[:, :, -1] = x
    out = torch.sum(conv_state * weight, dim=-1)
    if bias is not None:
        out = out + bias
    return F.silu(out) if activation in ("silu", "swish") else out


def _make_resnet34(pretrained=False, **kw):
    """torchvision-faithful resnet34 (BasicBlock 3/4/6/3) — torchvision is not
    installed in this environment, but the reference UM_Net only *unpacks* the
    torchvision module into its own attributes (`src/UM_Net/UM_Net.py:427-440`:
    conv1/bn1/relu/maxpool/layer1..4), so an architecture-exact stand-in with
    the same state_dict key layout preserves the reference semantics.
    `pretrained` is accepted and ignored (no weight files in this
    environment; the parity tests use random weights on both sides)."""
    import torch.nn as nn

    class BasicBlock(nn.Module):
        def __init__(self, inplanes, planes, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = None
            if stride != 1 or inplanes != planes:
                self.downsample = nn.Sequential(
                    nn.Conv2d(inplanes, planes, 1, stride, bias=False),
                    nn.BatchNorm2d(planes),
                )

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return self.relu(out + idt)

    class ResNet34(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            widths, blocks, inp = (64, 128, 256, 512), (3, 4, 6, 3), 64
            for i, (wd, n) in enumerate(zip(widths, blocks)):
                layers = []
                for j in range(n):
                    layers.append(BasicBlock(inp, wd, 2 if (i > 0 and j == 0) else 1))
                    inp = wd
                setattr(self, f"layer{i + 1}", nn.Sequential(*layers))
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc = nn.Linear(512, 1000)

    return ResNet34()


def make_ref_mamba_none(d_model, d_state=16, d_conv=4, expand=2):
    """Reference `Mamba()` with its default `bimamba_type="none"` — as shipped
    this cannot construct (both reference Mamba files hard-assert v3 at
    `mamba_simple.py:125`) and the modified module's none path would return
    unbound `o_1..o_3`; the self-consistent reading (used by UM_Net's RCG,
    `src/UM_Net/UM_Net.py:239-247`) is the VENDORED single-return module with
    the attribute flipped after construction, exactly like dkDualNet's v2."""
    install()
    vend = load_ref_model_file(
        "requirements/Mamba/mamba/mamba_ssm/modules/mamba_simple.py",
        name="_ref_mamba_vendored",
    )
    m = vend.Mamba(d_model=d_model, d_state=d_state, d_conv=d_conv,
                   expand=expand, bimamba_type="v3")
    m.bimamba_type = "none"
    return m


def make_ref_mamba_v2(d_model, d_state=16, d_conv=4, expand=2):
    """Reference `Mamba(bimamba_type="v2")` (dkDualNet's attention,
    `src/devDualNet/devDualNet.py:233-240`) — as shipped this cannot run:
    both Mamba files hard-assert v3 at construction, and the installed
    module's v2 branch never binds the o_1..o_3 it returns
    (`mamba_simple.py:267-269,362`). The self-consistent reading is the
    vendored module's own v2 branch (`modules/mamba_simple.py:265-288`,
    single return) constructed as v3 and flipped, with the unused q/k/v
    return slots (dkDualNet discards them) filled with None."""
    import types as _types

    install()
    vend = load_ref_model_file(
        "requirements/Mamba/mamba/mamba_ssm/modules/mamba_simple.py",
        name="_ref_mamba_vendored",
    )
    m = vend.Mamba(d_model=d_model, d_state=d_state, d_conv=d_conv,
                   expand=expand, bimamba_type="v3")
    m.bimamba_type = "v2"
    inner = m.forward

    def forward(self, hidden_states, inference_params=None):
        return inner(hidden_states, inference_params), None, None, None

    m.forward = _types.MethodType(forward, m)
    return m


def install():
    """Install the stub ecosystem; idempotent. Returns a namespace with the
    loaded reference modules."""
    global _installed
    ns = types.SimpleNamespace()
    if _installed:
        ns.ss = sys.modules["_ref_selective_scan_interface"]
        ns.cc = sys.modules["_ref_causal_conv1d_interface"]
        ns.mamba_simple = sys.modules["_ref_mamba_simple"]
        return ns

    import torch  # noqa: F401
    from einops import rearrange

    # 1. fake CUDA extension modules (never called: fast fns are rebound)
    _stub_module("selective_scan_cuda")
    _stub_module("causal_conv1d_cuda")

    # 2. reference causal-conv1d interface; package exposing its pure ref
    cc = _load_by_path("_ref_causal_conv1d_interface", _CC_PATH)
    _stub_module(
        "causal_conv1d",
        causal_conv1d_fn=cc.causal_conv1d_ref,
        causal_conv1d_update=causal_conv1d_update_ref,
    )

    # 3. reference selective-scan interface, fast paths -> its own refs
    ss = _load_by_path("_ref_selective_scan_interface", _SS_PATH)
    ss.selective_scan_fn = ss.selective_scan_ref

    def mamba_inner_fn_no_out_proj_ref(
        xz, conv1d_weight, conv1d_bias, x_proj_weight, delta_proj_weight,
        A, B=None, C=None, D=None, delta_bias=None, B_proj_bias=None,
        C_proj_bias=None, delta_softplus=True,
    ):
        """`mamba_inner_ref` (selective_scan_interface.py:636-671) minus the
        final out-proj linear — the pure-torch semantics of
        `MambaInnerFnNoOutProj` (`:155-225`), returning (B, D, L)."""
        import torch.nn.functional as F

        L = xz.shape[-1]
        delta_rank = delta_proj_weight.shape[1]
        d_state = A.shape[-1]
        x, z = xz.chunk(2, dim=1)
        x = cc.causal_conv1d_ref(
            x, rearrange(conv1d_weight, "d 1 w -> d w"), conv1d_bias, "silu"
        )
        x_dbl = F.linear(rearrange(x, "b d l -> (b l) d"), x_proj_weight)
        delta = delta_proj_weight @ x_dbl[:, :delta_rank].t()
        delta = rearrange(delta, "d (b l) -> b d l", l=L)
        if B is None:
            B = rearrange(
                x_dbl[:, delta_rank : delta_rank + d_state],
                "(b l) dstate -> b dstate l", l=L,
            ).contiguous()
        if C is None:
            C = rearrange(
                x_dbl[:, -d_state:], "(b l) dstate -> b dstate l", l=L
            ).contiguous()
        return ss.selective_scan_ref(
            x, delta, A, B, C, D, z=z, delta_bias=delta_bias, delta_softplus=True
        )

    ss.mamba_inner_fn_no_out_proj = mamba_inner_fn_no_out_proj_ref

    # 4. fabricate the mamba_ssm package tree the reference imports from
    pkg = _stub_module("mamba_ssm")
    ops = _stub_module("mamba_ssm.ops")
    pkg.ops = ops
    ssmod = _stub_module(
        "mamba_ssm.ops.selective_scan_interface",
        selective_scan_fn=ss.selective_scan_ref,
        selective_scan_ref=ss.selective_scan_ref,
        mamba_inner_fn=ss.mamba_inner_ref,
        bimamba_inner_fn=ss.bimamba_inner_ref,
        mamba_inner_fn_no_out_proj=mamba_inner_fn_no_out_proj_ref,
    )
    ops.selective_scan_interface = ssmod
    # no mamba_ssm.ops.triton: mamba_simple's try/except assigns None (CPU path)

    # 5. minimal stubs for unused heavyweight imports in reference model files
    import torch.nn as _nn

    class _DropPath(_nn.Module):  # eval-mode semantics: identity
        def __init__(self, drop_prob=0.0, *a, **k):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    def _to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    _stub_module("timm")
    _stub_module("timm.models")
    def _make_divisible(v, divisor=8, min_value=None, round_limit=0.9):
        min_value = min_value or divisor
        new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
        if new_v < round_limit * v:
            new_v += divisor
        return new_v

    _stub_module("timm.models.layers", trunc_normal_=lambda *a, **k: a[0] if a else None,
                 DropPath=_DropPath, to_2tuple=_to_2tuple,
                 make_divisible=_make_divisible)
    _stub_module("timm.models.registry", register_model=lambda f: f)
    _stub_module("timm.models.vision_transformer", _cfg=lambda **k: dict(k))
    tv = _stub_module("torchvision")
    tv.models = _stub_module("torchvision.models", resnet34=_make_resnet34)

    # mmengine init helpers (DuAT imports them; parity converts the LIVE
    # state_dict, so faithful in-place inits keep both sides identical)
    def _constant_init(module, val, bias=0):
        if getattr(module, "weight", None) is not None:
            _nn.init.constant_(module.weight, val)
        if getattr(module, "bias", None) is not None:
            _nn.init.constant_(module.bias, bias)

    def _kaiming_init(module, a=0, mode="fan_out", nonlinearity="relu",
                      bias=0, distribution="normal"):
        if distribution == "normal":
            _nn.init.kaiming_normal_(module.weight, a=a, mode=mode,
                                     nonlinearity=nonlinearity)
        else:
            _nn.init.kaiming_uniform_(module.weight, a=a, mode=mode,
                                      nonlinearity=nonlinearity)
        if getattr(module, "bias", None) is not None:
            _nn.init.constant_(module.bias, bias)

    _stub_module("mmengine")
    _stub_module("mmengine.model", constant_init=_constant_init,
                 kaiming_init=_kaiming_init)

    # minimal yacs (VANet's config system): CfgNode = dict with attribute
    # access + yaml merge; freeze/defrost are bookkeeping we don't need
    class _CfgNode(dict):
        def __init__(self, init_dict=None, new_allowed=False, **kw):
            super().__init__()
            for k, v in (init_dict or {}).items():
                self[k] = _CfgNode(v) if isinstance(v, dict) else v

        def __getattr__(self, name):
            try:
                return self[name]
            except KeyError:
                raise AttributeError(name)

        def __setattr__(self, name, value):
            self[name] = value

        def defrost(self):
            pass

        def freeze(self):
            pass

        def clone(self):
            import copy

            return copy.deepcopy(self)

        def _merge(self, other):
            for k, v in other.items():
                if isinstance(v, dict) and isinstance(self.get(k), _CfgNode):
                    self[k]._merge(v)
                else:
                    self[k] = _CfgNode(v) if isinstance(v, dict) else v

        def merge_from_file(self, path):
            import yaml

            with open(path) as f:
                self._merge(yaml.safe_load(f))

        def merge_from_list(self, opts):
            for k, v in zip(opts[0::2], opts[1::2]):
                node = self
                parts = k.split(".")
                for pk in parts[:-1]:
                    node = node[pk]
                node[parts[-1]] = v

    _stub_module("yacs")
    _stub_module("yacs.config", CfgNode=_CfgNode)

    # 6. the installed (modified) Mamba module. MMConv constructs
    # Mamba(bimamba_type="v1") which the module's own assert rejects
    # (`mamba_simple.py:125`, TODO at `MMUNet.py:33`); the only
    # self-consistent configuration is v3 (SURVEY.md §2.2), so the package
    # entry maps v1 -> v3 exactly as the rebuild does.
    mamba_simple = _load_by_path("_ref_mamba_simple", _MAMBA_PATH)

    def _mamba_dispatch(*a, **k):
        bt = k.get("bimamba_type", "none")
        if bt == "v1":
            # MMConv's "v1" annotation is v3 (SURVEY §2.2 gotcha)
            k["bimamba_type"] = "v3"
        elif bt == "none":
            # UM_Net's RCG constructs the default ("none") Mamba, which the
            # installed module's ctor assert rejects and whose none path
            # returns unbound o_1..o_3 — use the vendored single-return
            # module flipped to none (see make_ref_mamba_none)
            k.pop("bimamba_type", None)
            k.pop("nslices", None)
            return make_ref_mamba_none(*a, **k)
        elif bt == "v2":
            # dkDualNet's v2 Mamba: ctor assert + unbound o_1..o_3 again —
            # vendored v2 branch wrapped to the 4-return shape
            k.pop("bimamba_type", None)
            k.pop("nslices", None)
            return make_ref_mamba_v2(*a, **k)
        return mamba_simple.Mamba(*a, **k)

    pkg.Mamba = _mamba_dispatch

    _installed = True
    ns.ss, ns.cc, ns.mamba_simple = ss, cc, mamba_simple
    return ns


def load_ref_trainer():
    """Load the reference's top-level `train.py` (only `train_one_epoch` /
    `val_one_epoch` are defined at module level; the entry body is
    `__main__`-guarded at `/root/reference/train.py:158`). Its module-level
    imports (monai, pytz, objprint, easydict, timm.optim, `src.models`'
    MONAI-backed zoo) are stubbed just enough to import; none of the stubs
    are exercised by `train_one_epoch` itself except the annotation types."""
    install()
    if REF not in sys.path:
        sys.path.insert(0, REF)

    class _Anything:
        """Attribute sink for annotation-only uses (monai.metrics...)."""

        def __getattr__(self, name):
            return _Anything()

        def __call__(self, *a, **k):
            return _Anything()

    class _EasyDict(dict):
        def __init__(self, d=None, **kw):
            super().__init__()
            for k, v in {**(d or {}), **kw}.items():
                self[k] = _EasyDict(v) if isinstance(v, dict) else v

        def __getattr__(self, name):
            try:
                return self[name]
            except KeyError:
                raise AttributeError(name)

        __setattr__ = dict.__setitem__

    def _module_getattr(name):
        # never intercept dunders: inspect/torch walk sys.modules and read
        # __file__/__path__ etc. — those must raise AttributeError
        if name.startswith("__"):
            raise AttributeError(name)
        return _Anything()

    monai = _stub_module("monai")
    for sub in ("metrics", "transforms", "inferers", "losses", "utils"):
        mod = _stub_module(f"monai.{sub}")
        setattr(monai, sub, mod)
        mod.__getattr__ = _module_getattr
    sys.modules["monai.metrics"].CumulativeIterationMetric = object
    sys.modules["monai.transforms"].Compose = object
    sys.modules["monai.utils"].ensure_tuple_rep = (
        lambda v, n: (v,) * n if not isinstance(v, (tuple, list)) else tuple(v)
    )
    _stub_module("pytz", timezone=lambda name: None)
    _stub_module("objprint", objstr=lambda x: repr(x))
    _stub_module("easydict", EasyDict=_EasyDict)
    timm_optim = _stub_module("timm.optim", optim_factory=_stub_module(
        "timm.optim.optim_factory"))
    sys.modules["timm"].optim = timm_optim
    # short-circuit the zoo factory import chain (UNETR/SwinUNETR need real
    # MONAI); train_one_epoch never touches give_model
    _stub_module("src.models", give_model=None)
    return load_ref_model_file("train.py", name="_ref_train")


def load_ref_model_file(relpath: str, name: str | None = None):
    """Load a reference model file by path after installing the stubs.

    Adds /root/reference to sys.path so intra-repo `from src...` imports work.
    """
    install()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    modname = name or ("_ref_" + relpath.replace("/", "_").removesuffix(".py"))
    if modname in sys.modules:
        return sys.modules[modname]
    return _load_by_path(modname, os.path.join(REF, relpath))


# ---------------------------------------------------------------------------
# torch -> flax weight conversion for the rebuilt Mamba
# ---------------------------------------------------------------------------

def convert_mamba_params(torch_mamba, dt_rank: int, dt_scale: float = 1.0,
                         dt_init: str = "random"):
    """Convert a reference `Mamba` module's live weights to the flax
    `mm_unet_tpu.models.mamba.Mamba` parameter dict.

    The flax module stores `dt_proj*_weight` as U(0, 2s) and subtracts
    s = dt_rank^-0.5 * dt_scale at call time (mamba.py:119-120), so the torch
    weight is stored shifted by +s.
    """
    import numpy as np

    sd = {k: v.detach().cpu().numpy() for k, v in torch_mamba.state_dict().items()}
    dt_shift = (dt_rank ** -0.5) * dt_scale if dt_init == "random" else 0.0
    p = {"in_proj_weight": sd["in_proj.weight"],
         "out_proj_weight": sd["out_proj.weight"]}
    if "in_proj.bias" in sd:
        p["in_proj_bias"] = sd["in_proj.bias"]
    if "out_proj.bias" in sd:
        p["out_proj_bias"] = sd["out_proj.bias"]
    for suf in ("", "_b", "_s"):
        if f"conv1d{suf}.weight" not in sd:
            continue
        p[f"conv1d{suf}_weight"] = np.squeeze(sd[f"conv1d{suf}.weight"], 1)
        if f"conv1d{suf}.bias" in sd:
            p[f"conv1d{suf}_bias"] = sd[f"conv1d{suf}.bias"]
        p[f"x_proj{suf}_weight"] = sd[f"x_proj{suf}.weight"]
        p[f"dt_proj{suf}_weight"] = sd[f"dt_proj{suf}.weight"] + dt_shift
        p[f"dt_proj{suf}_bias"] = sd[f"dt_proj{suf}.bias"]
        p[f"A{suf}_log"] = sd[f"A{suf}_log"]
        p[f"D{suf}"] = sd[f"D{suf}"]
    return p
