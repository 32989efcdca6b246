"""SHA-1 document/URL hash with the reference's two-char alphabet.

Port of the reference ``tools/Hasher.java:9-39`` (/root/reference): the
40-char doc ID is SHA-1 over UTF-8 bytes where each digest byte ``b``
maps to a 256-entry two-letter alphabet with the signed-byte quirk
``index = b if b > 0 else 255 + b`` (Java bytes are signed, so byte
value 0 maps to index 255, and bytes 128..255 map to 127..254).
Must be reproduced bit-exactly for doc-ID rank identity.
"""

from __future__ import annotations

import hashlib

_FIRST = "abcdefghijklmnopqrstuvwxyz"
_SECOND = "acegikmoqs"
# byte2chars[i] = letter1[i % 26] + letter2[i // 26], matching the
# reference table layout ("aa","ba",...,"za","ac","bc",...).
_BYTE2CHARS = [_FIRST[i % 26] + _SECOND[i // 26] for i in range(256)]

# Java signed-byte quirk: unsigned byte u corresponds to signed
# b = u - 256 for u >= 128. index = b if b > 0 else 255 + b, i.e.:
#   u == 0          -> 255
#   1 <= u <= 127   -> u
#   u >= 128        -> (u - 256) + 255 = u - 1
_INDEX = [255 if u == 0 else (u if u <= 127 else u - 1) for u in range(256)]


def kvs_hash(x: str) -> str:
    """40-char doc ID for a string, identical to the reference Hasher."""
    digest = hashlib.sha1(x.encode("utf-8")).digest()
    return "".join(_BYTE2CHARS[_INDEX[u]] for u in digest)
