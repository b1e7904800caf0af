"""``python -m kevlar_tpu`` console entry point."""

from kevlar_tpu.cli import main

if __name__ == '__main__':
    main()
