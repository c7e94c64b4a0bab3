#!/usr/bin/env python
"""Authentication evaluation CLI (root-level entry mirroring the reference's
``authentication_eval/eval_gim_on_authentication.py``)."""

from optimalstrategiesagainstgenerativeattacks_tpu.eval.authentication import main

if __name__ == "__main__":
    main()
