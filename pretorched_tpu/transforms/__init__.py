# populated by transforms.utils (PIL oracle path) and transforms.fused (device path)
