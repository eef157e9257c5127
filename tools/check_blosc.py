#!/usr/bin/env python3
"""Dev-only cross-language validation of graft's Blosc frames.

Parses the c-blosc v1 header in pure Python, decompresses the zstd block
with pyarrow, byte-unshuffles, and compares against an uncompressed twin
chunk — independent evidence the Scala codec writes conformant frames
(numcodecs/zarr are not installed in this environment).

Usage: python3 tools/check_blosc.py <compressed_chunk> <uncompressed_chunk>
"""
import struct
import sys

import pyarrow as pa


def blosc_decode(frame: bytes) -> bytes:
    version, _, flags, typesize = frame[0], frame[1], frame[2], frame[3]
    nbytes, _blocksize, _cbytes = struct.unpack_from('<III', frame, 4)
    assert version == 2, f"unexpected blosc format version {version}"
    if flags & 0x2:  # memcpy frame: payload directly after the 16-B header
        return frame[16:16 + nbytes]
    bstart = struct.unpack_from('<I', frame, 16)[0]
    blen = struct.unpack_from('<I', frame, bstart)[0]
    payload = frame[bstart + 4:bstart + 4 + blen]
    raw = pa.decompress(payload, decompressed_size=nbytes, codec='zstd')
    if flags & 0x1:  # byte-shuffle filter
        n = nbytes // typesize
        out = bytearray(nbytes)
        for j in range(typesize):
            out[j::typesize] = raw[j * n:(j + 1) * n]
        return bytes(out)
    return raw


def main(comp_path, uncomp_path):
    comp = open(comp_path, 'rb').read()
    uncomp = open(uncomp_path, 'rb').read()
    dec = blosc_decode(comp)
    print(f"compressed {len(comp)} B -> decoded {len(dec)} B; twin {len(uncomp)} B")
    if dec != uncomp:
        print("MISMATCH")
        return 1
    print("MATCH")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
