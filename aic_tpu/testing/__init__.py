"""Test apparatus (reference: test-renderers image comparison harness)."""

from .imagecmp import Threshold, compare_to_golden, diff_images, images_match

__all__ = ["Threshold", "compare_to_golden", "diff_images", "images_match"]
