"""Neural-network building blocks (Flax linen)."""

from .blocks import (
    ChannelWiseSymmetricConv,
    FakeChannelWiseSymmetricConv,
    FourierBlock,
    MiniResNet,
    MiniUNet,
    ResidualBlock,
    ResNet,
    ResNetPOH,
    RGBDUNet,
    SymmetricConv2d,
    UNet,
)

__all__ = [
    "ChannelWiseSymmetricConv",
    "FakeChannelWiseSymmetricConv",
    "FourierBlock",
    "MiniResNet",
    "MiniUNet",
    "ResidualBlock",
    "ResNet",
    "ResNetPOH",
    "RGBDUNet",
    "SymmetricConv2d",
    "UNet",
]
