"""``python -m kevlar_tpu.native.build`` — compile the native library."""

from kevlar_tpu.native import build

if __name__ == '__main__':
    print(build(verbose=True))
