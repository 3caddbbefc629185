"""Golden-token parity: our byte-BPE tokenizer vs the reference's
``simple_tokenizer.py``, run on a shared synthetic merges file.

The reference vocab gz isn't shipped, but the ALGORITHM must match
(`/root/reference/tools/utils/simple_tokenizer.py`): byte->unicode table,
</w> word-end marker, lowest-rank-first merge loop, regex pre-tokenizer.
ftfy (absent in this image) is stubbed with identity — the test corpus is
plain ASCII where fix_text is the identity anyway.
"""

import gzip
import importlib.util
import sys
import types

import pytest

from aicity_action_tpu.data.tokenizer import SimpleTokenizer


@pytest.fixture(scope="module")
def merges_gz(tmp_path_factory):
    d = tmp_path_factory.mktemp("bpe")
    path = d / "merges.txt.gz"
    merges = [
        "#version: synthetic",
        "t h",
        "th e</w>",
        "i n",
        "in g</w>",
        "d r",
        "dr i",
        "dri v",
        "driv ing</w>",
        "c a",
        "ca r</w>",
        "a</w> a</w>",  # unused junk pair exercising rank ordering
    ]
    with gzip.open(path, "wt") as f:
        f.write("\n".join(merges))
    return str(path)


@pytest.fixture(scope="module")
def ref_tokenizer(merges_gz):
    if "ftfy" not in sys.modules:
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda s: s
        sys.modules["ftfy"] = stub
    spec = importlib.util.spec_from_file_location(
        "ref_simple_tokenizer",
        "/root/reference/tools/utils/simple_tokenizer.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.SimpleTokenizer(merges_gz)


CORPUS = [
    "the driver is driving the car",
    "Driving!  a CAR, the car's wheel",
    "texting-right phone_call 42 times",
    "reaching behind... eating & drinking",
    "<|startoftext|> hands on wheel <|endoftext|>",
    "yawning  with   many     spaces",
]


def test_encode_matches_reference(merges_gz, ref_tokenizer):
    ours = SimpleTokenizer(merges_gz)
    for text in CORPUS:
        got = ours.encode(text)
        want = ref_tokenizer.encode(text)
        assert got == want, (text, got, want)


def test_decode_roundtrip_matches_reference(merges_gz, ref_tokenizer):
    ours = SimpleTokenizer(merges_gz)
    for text in CORPUS[:4]:
        ids = ours.encode(text)
        assert ours.decode(ids) == ref_tokenizer.decode(ids)
