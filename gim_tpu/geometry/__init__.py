"""Geometry: epipolar math, batched on-chip RANSAC, pose errors."""
