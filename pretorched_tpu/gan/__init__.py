from .biggan import BigGAN, biggan128, biggan256, sample  # noqa: F401
