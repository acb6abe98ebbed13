# SPDX-License-Identifier: Apache-2.0
"""Per-request KV block management over the BlockPool.

Owns the request -> block-table mapping, prefix-cache lookups, incremental
block growth during decode, and hash registration of completed blocks
(TPU-native rebuild of the vLLM KV-cache-manager capability the reference
relies on, SURVEY.md §2.2 V4)."""
from __future__ import annotations

from typing import Optional

from vllm_neuron_tpu.core.block_pool import (BlockPool, KVBlock,
                                             hash_block_tokens)
from vllm_neuron_tpu.engine.request import Request
from vllm_neuron_tpu.utils import cdiv, init_logger

logger = init_logger(__name__)


class KVCacheManager:

    def __init__(self, num_blocks: int, block_size: int,
                 enable_prefix_caching: bool):
        self.block_size = block_size
        self.enable_prefix_caching = enable_prefix_caching
        self.block_pool = BlockPool(num_blocks, enable_prefix_caching)
        self.req_blocks: dict[str, list[KVBlock]] = {}
        # Tokens whose full blocks have been hash-registered, per request.
        self._num_cached_tokens: dict[str, int] = {}

    # ------------------------------------------------------------------

    def _block_hashes(self, request: Request, num_blocks: int) -> list[int]:
        """Content hashes for the first ``num_blocks`` full blocks of the
        request's token stream (prompt + outputs), extending the cached
        chain as needed."""
        hashes = request.block_hashes
        tokens = request.all_token_ids
        while len(hashes) < num_blocks:
            i = len(hashes)
            start = i * self.block_size
            end = start + self.block_size
            if end > len(tokens):
                break
            # LoRA changes the K/V projections and image content changes
            # every downstream KV (embeds-merge and cross-attention alike),
            # so cached KV is only reusable under the SAME adapter AND the
            # same image: seed the hash chain with both (plain text keeps
            # the legacy None seed).
            if hashes:
                parent = hashes[-1]
            else:
                seed = []
                if getattr(request, "lora_int_id", 0):
                    seed.append(("lora", request.lora_int_id))
                if getattr(request, "mm_hash", None):
                    seed.append(("mm", request.mm_hash))
                parent = tuple(seed) if seed else None
            hashes.append(hash_block_tokens(parent,
                                            tuple(tokens[start:end])))
        return hashes[:num_blocks]

    def get_computed_blocks(self,
                            request: Request) -> tuple[list[KVBlock], int]:
        """Longest cached prefix for a new request. Returns (blocks, tokens).

        Reuse is capped so at least one prompt token is always computed —
        the model must produce logits for the last prompt token.
        """
        if not self.enable_prefix_caching or request.num_prompt_tokens < 2:
            return [], 0
        # Only FULL blocks are reusable; also keep >=1 token to compute.
        max_reusable = (request.num_prompt_tokens - 1) // self.block_size
        hashes = self._block_hashes(request, max_reusable)
        blocks: list[KVBlock] = []
        for h in hashes:
            block = self.block_pool.get_cached_block(h)
            if block is None:
                break
            blocks.append(block)
        return blocks, len(blocks) * self.block_size

    def get_sibling_blocks(self, request: Request,
                           parent: Request) -> tuple[list[KVBlock], int]:
        """Shareable full prompt blocks from an n>1 sibling parent. Siblings
        carry the identical prompt, so the parent's full prompt blocks hold
        byte-identical KV — reuse them directly (ref-counted), no hash chain
        needed, prefix caching on or off. Same >=1-token-computed cap as
        get_computed_blocks."""
        if request.num_prompt_tokens < 2:
            return [], 0
        pblocks = self.req_blocks.get(parent.req_id)
        if not pblocks:
            return [], 0
        max_reusable = (request.num_prompt_tokens - 1) // self.block_size
        avail = min(max_reusable,
                    parent.num_computed_tokens // self.block_size,
                    len(pblocks))
        if avail <= 0:
            return [], 0
        return pblocks[:avail], avail * self.block_size

    def allocate_slots(
        self,
        request: Request,
        num_new_tokens: int,
        computed_blocks: Optional[list[KVBlock]] = None,
    ) -> Optional[list[int]]:
        """Ensure the request's block table covers
        ``num_computed_tokens + num_new_tokens`` tokens. Returns the NEWLY
        allocated block ids (possibly []) or None if the pool can't satisfy
        the request (caller decides whether to preempt)."""
        blocks = self.req_blocks.setdefault(request.req_id, [])
        # The caller sets request.num_computed_tokens only after a successful
        # allocation, so the cached-prefix length must come from
        # computed_blocks here, not from the request.
        base_tokens = request.num_computed_tokens
        if computed_blocks:
            assert not blocks, "computed blocks only apply to fresh requests"
            for b in computed_blocks:
                self.block_pool.touch(b)
            blocks.extend(computed_blocks)
            self._num_cached_tokens[request.req_id] = \
                len(computed_blocks) * self.block_size
            base_tokens = len(computed_blocks) * self.block_size
        total_tokens = base_tokens + num_new_tokens
        num_needed = cdiv(total_tokens, self.block_size)
        num_new_blocks = num_needed - len(blocks)
        if num_new_blocks <= 0:
            return []
        if num_new_blocks > self.block_pool.num_free_blocks:
            if computed_blocks:
                # Roll back the touched prefix blocks.
                self.block_pool.free(computed_blocks)
                del self.req_blocks[request.req_id]
                self._num_cached_tokens.pop(request.req_id, None)
            return None
        new_blocks = self.block_pool.allocate(num_new_blocks)
        blocks.extend(new_blocks)
        return [b.block_id for b in new_blocks]

    def cache_blocks(self, request: Request) -> None:
        """Register content hashes for blocks that became full (their KV has
        been computed). Called after a step executes, so a registered hash
        always points at valid cache contents."""
        if not self.enable_prefix_caching:
            return
        blocks = self.req_blocks.get(request.req_id)
        if not blocks:
            return
        num_full = request.num_computed_tokens // self.block_size
        num_full = min(num_full, len(blocks))
        already = self._num_cached_tokens.get(request.req_id,
                                              0) // self.block_size
        if num_full <= already:
            return
        hashes = self._block_hashes(request, num_full)
        for i in range(already, min(num_full, len(hashes))):
            self.block_pool.cache_block(blocks[i], hashes[i])
        self._num_cached_tokens[request.req_id] = num_full * self.block_size

    def get_block_ids(self, req_id: str) -> list[int]:
        return [b.block_id for b in self.req_blocks.get(req_id, [])]

    def free(self, request: Request) -> None:
        blocks = self.req_blocks.pop(request.req_id, None)
        self._num_cached_tokens.pop(request.req_id, None)
        if blocks:
            # Free in reverse so the LRU evicts deepest-suffix blocks first,
            # keeping common prefixes cached longest.
            self.block_pool.free(list(reversed(blocks)))

    @property
    def num_free_blocks(self) -> int:
        return self.block_pool.num_free_blocks

    def usage(self) -> float:
        return 1.0 - self.block_pool.num_free_blocks / \
            self.block_pool.num_blocks
