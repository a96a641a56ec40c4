"""Standalone mini-UNet — parity with the reference's top-level `model.py`
(86 LoC, the `data.py`/`loss.py` mini-pipeline's model, unused by the main
trainer). Thin alias over the zoo UNet: with bilinear=False the reference's
mini `Unet` (`model.py:57-86`) is architecturally identical to
`src/Unet/Unet.py` (InConv==DoubleConv, ConvTranspose up path at factor 1),
so the alias pins that mode — the mini model's default `Up(bilinear=False)`
uses ConvTranspose2d, unlike the zoo default."""

from mm_unet_tpu.models.unet import UNet


def Unet(num_classes: int = 1, n_channels: int = 3) -> UNet:
    return UNet(n_channels=n_channels, num_classes=num_classes, bilinear=False)
