"""Generate random test files of different sizes (reference:
proof-of-storage/scripts/generate_test_files_of_different_sizes.rs).

Usage: python scripts/generate_test_files.py [min_pow10] [max_pow10] [dir]
Creates <10^k>_byte_file.bytes for k in [min, max].
"""

import os
import sys
from pathlib import Path


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    out = Path(sys.argv[3]) if len(sys.argv) > 3 else Path("test_files")
    out.mkdir(parents=True, exist_ok=True)
    for k in range(lo, hi + 1):
        n = 10 ** k
        path = out / f"{n}_byte_file.bytes"
        with open(path, "wb") as f:
            remaining = n
            while remaining > 0:
                chunk = min(remaining, 1 << 20)
                f.write(os.urandom(chunk))
                remaining -= chunk
        print(f"wrote {path} ({n} bytes)")


if __name__ == "__main__":
    main()
