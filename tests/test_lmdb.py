"""Pure-Python LMDB reader (data/lmdb_reader.py) against spec-faithful
fixture files.

No liblmdb / py-lmdb / torchvision exists in this environment, so fixtures
are written by `_LmdbWriter` below, which lays out pages exactly per the
LMDB file format (16-byte page headers, dual meta pages with txnid
selection, sorted node-offset arrays, branch pages, F_BIGDATA overflow
chains). The writer exists only for tests; the reader is the product code
the LSUN path uses (reference mydataset.py:132-141).
"""

import io
import os
import struct

import numpy as np
import pytest

from masked_diffusion_tpu.data.lmdb_reader import LMDBFormatError, LMDBReader

PSIZE = 4096
P_BRANCH, P_LEAF, P_OVERFLOW, P_META = 0x01, 0x02, 0x04, 0x08
F_BIGDATA = 0x01
P_INVALID = 0xFFFFFFFFFFFFFFFF


def _page_header(pgno, flags, lower, upper):
    return struct.pack("<QHHHH", pgno, 0, flags, lower, upper)


def _node(lo, hi, nflags, key, payload=b""):
    body = struct.pack("<HHHH", lo, hi, nflags, len(key)) + key + payload
    if len(body) % 2:
        body += b"\x00"
    return body


def _build_page(pgno, flags, nodes):
    """Pack nodes bottom-up from the page top, ptr array at the bottom —
    the LMDB layout. `nodes` are pre-packed node byte strings in key order."""
    offsets, blob_parts = [], []
    upper = PSIZE
    for nb in reversed(nodes):
        upper -= len(nb)
        blob_parts.append((upper, nb))
    offsets = sorted(off for off, _ in blob_parts)
    # node i (key order) is the i-th from the END of blob_parts
    node_offs = [off for off, _ in reversed(blob_parts)]
    lower = 16 + 2 * len(nodes)
    page = bytearray(PSIZE)
    page[:16] = _page_header(pgno, flags, lower, min(node_offs) if nodes else PSIZE)
    for i, off in enumerate(node_offs):
        struct.pack_into("<H", page, 16 + 2 * i, off)
    for off, nb in blob_parts:
        page[off : off + len(nb)] = nb
    return bytes(page)


def _meta_page(pgno, root, entries, last_pg, txnid, depth=1):
    db_free = struct.pack("<IHHQQQQQ", PSIZE, 0, 0, 0, 0, 0, 0, P_INVALID)
    db_main = struct.pack("<IHHQQQQQ", 0, 0, depth, 0, 1, 0, entries, root)
    meta = (
        struct.pack("<II", 0xBEEFC0DE, 1)
        + struct.pack("<QQ", 0, PSIZE * (last_pg + 1))
        + db_free
        + db_main
        + struct.pack("<QQ", last_pg, txnid)
    )
    page = bytearray(PSIZE)
    page[:16] = _page_header(pgno, P_META, 0, 0)
    page[16 : 16 + len(meta)] = meta
    return bytes(page)


def write_lmdb(path, items, use_branch=False, bigdata_keys=()):
    """Write items ({key: value} bytes) as a minimal LMDB data.mdb."""
    os.makedirs(path, exist_ok=True)
    keys = sorted(items)
    pages = {}  # pgno -> bytes
    next_pg = 2

    def put_overflow(data):
        nonlocal next_pg
        n_pages = -(-(len(data) + 16) // PSIZE)
        pgno = next_pg
        blob = bytearray(n_pages * PSIZE)
        blob[:16] = struct.pack("<QHHI", pgno, 0, P_OVERFLOW, n_pages)
        blob[16 : 16 + len(data)] = data
        for i in range(n_pages):
            pages[pgno + i] = bytes(blob[i * PSIZE : (i + 1) * PSIZE])
        next_pg += n_pages
        return pgno

    def leaf_nodes(subkeys):
        # overflow pages are allocated DURING node packing, so all node lists
        # must be built before any tree page number is assigned
        nodes = []
        for k in subkeys:
            v = items[k]
            # LMDB spills values that don't fit a node to overflow pages;
            # mimic that for anything bigger than ~1/3 page
            if k in bigdata_keys or (8 + len(k) + len(v)) > PSIZE // 3:
                ovf = put_overflow(v)
                nodes.append(
                    _node(len(v) & 0xFFFF, len(v) >> 16, F_BIGDATA, k,
                          struct.pack("<Q", ovf))
                )
            else:
                nodes.append(_node(len(v) & 0xFFFF, len(v) >> 16, 0, k, v))
        return nodes

    if not use_branch:
        nodes = leaf_nodes(keys)  # may allocate overflow pages first
        root = next_pg
        next_pg += 1
        pages[root] = _build_page(root, P_LEAF, nodes)
        depth = 1
    else:
        half = len(keys) // 2
        nodes_a, nodes_b = leaf_nodes(keys[:half]), leaf_nodes(keys[half:])
        leaf_a, leaf_b = next_pg, next_pg + 1
        root = next_pg + 2
        next_pg += 3
        pages[leaf_a] = _build_page(leaf_a, P_LEAF, nodes_a)
        pages[leaf_b] = _build_page(leaf_b, P_LEAF, nodes_b)
        pages[root] = _build_page(
            root, P_BRANCH,
            [
                _node(leaf_a & 0xFFFF, (leaf_a >> 16) & 0xFFFF, leaf_a >> 32, b""),
                _node(leaf_b & 0xFFFF, (leaf_b >> 16) & 0xFFFF, leaf_b >> 32,
                      keys[half]),
            ],
        )
        depth = 2

    last_pg = next_pg - 1
    blob = bytearray(PSIZE * (last_pg + 1))
    # stale meta 0 (txnid 1) + live meta 1 (txnid 2) exercises meta selection
    blob[0:PSIZE] = _meta_page(0, P_INVALID, 0, 1, txnid=1)
    blob[PSIZE : 2 * PSIZE] = _meta_page(1, root, len(keys), last_pg, txnid=2, depth=depth)
    for pgno, pg in pages.items():
        blob[pgno * PSIZE : pgno * PSIZE + len(pg)] = pg
    with open(os.path.join(path, "data.mdb"), "wb") as f:
        f.write(bytes(blob))
    return path


class TestReader:
    def test_leaf_roundtrip(self, tmp_path):
        items = {b"a": b"alpha", b"b": b"beta" * 10, b"c": b"\x00\xff" * 7}
        env = write_lmdb(str(tmp_path / "env"), items)
        with LMDBReader(env) as r:
            assert len(r) == 3
            assert dict(r.items()) == items

    def test_branch_pages(self, tmp_path):
        items = {f"k{i:03d}".encode(): os.urandom(20) for i in range(40)}
        env = write_lmdb(str(tmp_path / "env"), items, use_branch=True)
        with LMDBReader(env) as r:
            got = list(r.items())
            assert [k for k, _ in got] == sorted(items)  # key order
            assert dict(got) == items

    def test_bigdata_overflow(self, tmp_path):
        big = os.urandom(3 * PSIZE + 123)  # spans 4 overflow pages
        items = {b"big": big, b"small": b"x"}
        env = write_lmdb(str(tmp_path / "env"), items, bigdata_keys={b"big"})
        with LMDBReader(env) as r:
            assert dict(r.items()) == items

    def test_bad_magic_raises(self, tmp_path):
        p = tmp_path / "env"
        p.mkdir()
        (p / "data.mdb").write_bytes(b"\x00" * 8192)
        with pytest.raises(LMDBFormatError):
            LMDBReader(str(p))

    def test_missing_file_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            LMDBReader(str(tmp_path / "nope"))


class TestLSUNDataset:
    def _encode(self, rng, w=40, h=30):
        from PIL import Image

        arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return buf.getvalue()

    def test_get_dataset_lsun_lmdb(self, tmp_path):
        """name='lsun' + split='church' reads <dir>/lsun/church_outdoor_train
        _lmdb/data.mdb (reference mydataset.py:132-141 torchvision layout)."""
        from masked_diffusion_tpu.data.datasets import get_dataset

        rng = np.random.default_rng(0)
        items = {f"hash{i}".encode(): self._encode(rng) for i in range(6)}
        write_lmdb(
            str(tmp_path / "lsun" / "church_outdoor_train_lmdb"), items
        )
        ds = get_dataset(str(tmp_path), "lsun", 16, split="church")
        assert ds.data.shape == (6, 16, 16, 3)
        assert ds.data.min() >= -1.0 and ds.data.max() <= 1.0
        assert ds.data.std() > 0.05  # actually decoded image content

    def test_get_dataset_lsun_subset_limit(self, tmp_path):
        from masked_diffusion_tpu.data.datasets import get_dataset

        rng = np.random.default_rng(1)
        items = {f"h{i:02d}".encode(): self._encode(rng) for i in range(8)}
        write_lmdb(str(tmp_path / "lsun" / "bedroom_train_lmdb"), items)
        ds = get_dataset(
            str(tmp_path), "lsun", 16, split="bedroom",
            data_subset=True, num_data=3,
        )
        assert len(ds) == 3

    def test_unknown_split_raises(self, tmp_path):
        from masked_diffusion_tpu.data.datasets import load_lsun

        with pytest.raises(ValueError, match="LSUN split"):
            load_lsun(str(tmp_path), "kitchenette", 16)
