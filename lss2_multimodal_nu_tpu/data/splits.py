"""Scene-split tables (data assets).

Two split families exist in the reference and are preserved exactly:
  * `nu_a2d` — the custom 200/50/50 nu-A2D splits (src/datasplit.py), used by
    main training/eval (src/data.py:9);
  * `nuscenes_full` — the larger original splits (src/datasplit_npre.py),
    used only by pre-training (src/data_pretrain.py:10).
The mismatch between the two split modules is intentional (SURVEY Appendix B).
"""
from __future__ import annotations

import functools
import json
import os
from typing import Dict, List

_ASSET = os.path.join(os.path.dirname(__file__), "assets", "scene_splits.json")


@functools.lru_cache(maxsize=1)
def _load() -> Dict[str, Dict[str, List[str]]]:
    return json.load(open(_ASSET))


def create_splits_scenes(family: str = "nu_a2d") -> Dict[str, List[str]]:
    """family: 'nu_a2d' (datasplit.py) or 'nuscenes_full' (datasplit_npre.py)."""
    return _load()[family]
