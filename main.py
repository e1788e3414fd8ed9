#!/usr/bin/env python3
"""Unified entry point (reference parity: main.py).

Usage:
    python main.py --mode train --config configs/default.yaml
    python main.py --mode eval --checkpoint outputs/exp/best
    python main.py --mode inference --checkpoint outputs/exp/best --input data/test
    python main.py --mode preprocess --input data/raw --output data/processed
    python main.py --mode analysis --input outputs/predictions
    python main.py --mode explain --checkpoint outputs/exp/best --input data/test
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from multimodal_organ_segmentation_tpu.cli import main

if __name__ == "__main__":
    main()
