import sys

from buckgnn_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
