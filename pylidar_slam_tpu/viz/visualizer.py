"""Image visualization (reference slam/viz/visualizer.py).

The reference opens cv2 windows; in headless/TPU environments windows are
unavailable, so this visualizer writes PNG frames to a directory (and uses
cv2 windows only when explicitly requested and cv2 is importable).
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from pylidar_slam_tpu.viz.color_map import save_image, tensor_to_image

try:
    import cv2  # noqa: F401
    _with_cv2 = True
except ImportError:
    _with_cv2 = False


class ImageVisualizer:
    """Shows or persists image tensors per update."""

    def __init__(self, output_dir: Optional[str] = None,
                 window_name: str = "pylidar_slam_tpu",
                 use_window: bool = False, cmap: str = "viridis"):
        self.output_dir = Path(output_dir) if output_dir else None
        if self.output_dir:
            self.output_dir.mkdir(parents=True, exist_ok=True)
        self.window_name = window_name
        self.use_window = use_window and _with_cv2
        self.cmap = cmap
        self._counter = 0

    def update(self, tensor: np.ndarray, tag: str = "frame"):
        image = tensor_to_image(np.asarray(tensor), cmap=self.cmap)
        if self.use_window:
            import cv2
            cv2.imshow(self.window_name, image[..., ::-1])
            cv2.waitKey(1)
        if self.output_dir is not None:
            save_image(str(self.output_dir / f"{tag}_{self._counter:06}.png"),
                       image)
        self._counter += 1

    def close(self):
        if self.use_window:
            import cv2
            cv2.destroyWindow(self.window_name)
