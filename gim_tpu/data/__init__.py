"""Data layer: ZEB benchmark loaders, WALK training data, augmentation."""
