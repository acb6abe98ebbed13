# SPDX-License-Identifier: Apache-2.0
"""Block-table KV allocator with hash-based prefix caching.

TPU-native rebuild of the capability the reference gets from vLLM's block
manager (SURVEY.md §2.2 V4): content-hash prefix reuse, LRU eviction of
unreferenced cached blocks, and a reserved null block. Unlike the reference's
external "+1 null block" surgery (vllm_neuron/platform.py:149-159), the null
block (id 0) is allocated internally: callers configure N usable blocks and
the pool manages ids 1..N; id 0 backs padded block-table entries.
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import Optional

from vllm_neuron_tpu.utils import init_logger

logger = init_logger(__name__)

NULL_BLOCK_ID = 0


def hash_block_tokens(parent_hash: Optional[int],
                      token_ids: tuple[int, ...]) -> int:
    """Content hash chaining a block's tokens onto its prefix's hash."""
    h = hashlib.sha256()
    h.update(str(parent_hash).encode())
    h.update(b":")
    h.update(",".join(map(str, token_ids)).encode())
    return int.from_bytes(h.digest()[:8], "little")


@dataclass
class KVBlock:
    block_id: int
    ref_count: int = 0
    # Content hash once the block is FULL and registered for reuse.
    block_hash: Optional[int] = None
    # LRU doubly-linked free-list pointers.
    prev_free: Optional["KVBlock"] = field(default=None, repr=False)
    next_free: Optional["KVBlock"] = field(default=None, repr=False)


class FreeBlockQueue:
    """Doubly-linked LRU queue of ref_count==0 blocks. Eviction pops from the
    front (least recently freed); cached blocks can be plucked from the middle
    when a prefix hit revives them."""

    def __init__(self, blocks: list[KVBlock]):
        self.num_free = len(blocks)
        self._head: Optional[KVBlock] = None
        self._tail: Optional[KVBlock] = None
        for b in blocks:
            self._append(b)

    def _append(self, block: KVBlock) -> None:
        block.prev_free = self._tail
        block.next_free = None
        if self._tail is not None:
            self._tail.next_free = block
        self._tail = block
        if self._head is None:
            self._head = block

    def append(self, block: KVBlock) -> None:
        self._append(block)
        self.num_free += 1

    def remove(self, block: KVBlock) -> None:
        if block.prev_free is not None:
            block.prev_free.next_free = block.next_free
        else:
            self._head = block.next_free
        if block.next_free is not None:
            block.next_free.prev_free = block.prev_free
        else:
            self._tail = block.prev_free
        block.prev_free = block.next_free = None
        self.num_free -= 1

    def popleft(self) -> KVBlock:
        if self._head is None:
            raise RuntimeError("out of KV blocks")
        block = self._head
        self.remove(block)
        return block


class BlockPool:

    def __init__(self, num_blocks: int, enable_caching: bool):
        # ids 1..num_blocks are usable; 0 is the null block.
        self.num_blocks = num_blocks
        self.enable_caching = enable_caching
        self.blocks = [KVBlock(i) for i in range(num_blocks + 1)]
        self.null_block = self.blocks[NULL_BLOCK_ID]
        self.null_block.ref_count = 1  # never allocatable
        self.free_queue = FreeBlockQueue(self.blocks[1:])
        # hash -> block currently holding that content (one winner per hash).
        self.cached_hash_to_block: dict[int, KVBlock] = {}
        # Counters for observability.
        self.hits = 0
        self.queries = 0

    @property
    def num_free_blocks(self) -> int:
        return self.free_queue.num_free

    def get_cached_block(self, block_hash: int) -> Optional[KVBlock]:
        self.queries += 1
        block = self.cached_hash_to_block.get(block_hash)
        if block is not None:
            self.hits += 1
        return block

    def touch(self, block: KVBlock) -> None:
        """Take a reference; revive from the free queue if needed."""
        if block.ref_count == 0 and block is not self.null_block:
            self.free_queue.remove(block)
        block.ref_count += 1

    def allocate(self, num_blocks: int) -> list[KVBlock]:
        if num_blocks > self.num_free_blocks:
            raise RuntimeError(
                f"cannot allocate {num_blocks} blocks "
                f"({self.num_free_blocks} free)")
        out = []
        for _ in range(num_blocks):
            block = self.free_queue.popleft()
            self._evict(block)
            block.ref_count = 1
            out.append(block)
        # Ascending-id order within one allocation: requests free their
        # blocks tail-first (kv_cache_manager.free reverses for LRU prefix
        # retention), so a multi-block grab often pops a DESCENDING
        # consecutive run — sorting re-forms the ascending run the decode
        # kernel's contiguous-chunk DMA fast path detects
        # (ops/decode_attention._flat_kernel) and keeps a row's pages
        # physically consecutive (near-sequential HBM streaming). Eviction is
        # unchanged; only position assignment within this call moves.
        out.sort(key=lambda b: b.block_id)
        return out

    def _evict(self, block: KVBlock) -> None:
        if block.block_hash is not None:
            cached = self.cached_hash_to_block.get(block.block_hash)
            if cached is block:
                del self.cached_hash_to_block[block.block_hash]
            block.block_hash = None

    def cache_block(self, block: KVBlock, block_hash: int) -> None:
        """Register a now-full block's content hash for future reuse."""
        if not self.enable_caching or block.block_hash is not None:
            return
        block.block_hash = block_hash
        # Last writer wins; the previous holder just loses reuse eligibility.
        self.cached_hash_to_block[block_hash] = block

    def free(self, blocks: list[KVBlock]) -> None:
        """Release references; fully-released blocks go to the LRU tail (so
        recently used content survives longest — reference vLLM semantics)."""
        for block in blocks:
            if block is self.null_block:
                continue
            assert block.ref_count > 0, f"double free of {block}"
            block.ref_count -= 1
            if block.ref_count == 0:
                self.free_queue.append(block)

    def reset_prefix_cache(self) -> None:
        for block in self.blocks:
            block.block_hash = None
        self.cached_hash_to_block.clear()
