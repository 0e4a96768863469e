"""``python -m show_and_tell_tpu`` — point users at the entry points."""

import sys

BANNER = """\
show_and_tell_tpu — TPU-native image captioning (JAX/XLA/Pallas)

Entry points (each accepts --help):
  python -m show_and_tell_tpu.cli.preprocess        build vocab + data.json from Karpathy JSON
  python -m show_and_tell_tpu.cli.main              train (SPMD step, CIDEr-gated checkpoints)
  python -m show_and_tell_tpu.cli.evaluate          val loss + beam decode + full metric suite
  python -m show_and_tell_tpu.cli.extract_features  precompute encoder features (.npz)
  python -m show_and_tell_tpu.cli.caption           caption image files/directories (serving)

Benchmarks: python bench.py | bench_train.py | benchmarks/baseline_workloads.py
Docs: README.md, docs/{STATUS,PARITY,KERNELS,SCALING}.md
"""


def main() -> int:
    try:
        print(BANNER)
    except BrokenPipeError:  # `| head` closed the pipe — not an error
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
