"""Depth / segmentation network families (okvis_deep_learning parity) —
populated with the stereo-depth and MVS-fusion models."""
