"""Dump the fully-resolved run config (reference tools/print_config.py).

Accepts the SAME flag surface as tools/train.py (preset + every ablation
flag + dotted --set overrides) and prints the resolved typed-dataclass
tree as JSON — the equivalent of mmcv ``Config.pretty_text`` after the
``_base_`` merge and launcher mutations.

    python tools/print_config.py --config cs2dsec --events_bins_5_avg_1
    python tools/print_config.py --config cs2dz --set optim.lr=1e-4 \
        --dump resolved.json
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def resolved_config_dict(argv=None) -> dict:
    from tools.train import parse_args, build_config
    old = sys.argv
    try:
        if argv is not None:
            sys.argv = ["print_config.py"] + list(argv)
        args = parse_args()
    finally:
        sys.argv = old
    return dataclasses.asdict(build_config(args)), args


def main():
    argv = sys.argv[1:]
    dump = None
    if "--dump" in argv:
        i = argv.index("--dump")
        dump = argv[i + 1]
        del argv[i:i + 2]
    cfg_dict, _ = resolved_config_dict(argv)
    text = json.dumps(cfg_dict, indent=2, default=str, sort_keys=True)
    print(text)
    if dump:
        with open(dump, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
