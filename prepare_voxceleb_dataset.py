#!/usr/bin/env python
"""VoxCeleb2 mp4 -> frame-JPEG dataset prep (root-level entry mirroring the
reference's ``data_handling/prepare_voxceleb_dataset.py``)."""

from optimalstrategiesagainstgenerativeattacks_tpu.data.voxceleb_prep import main

if __name__ == "__main__":
    main()
