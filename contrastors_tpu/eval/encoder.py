"""Inference encoders: BiEncoder -> embedding API for MTEB/BEIR-style evals.

TPU counterpart of the reference Encoder/STransformer adapters
(reference: eval/encoder.py:106-374). The reference spawns one CUDA worker
per GPU with a multiprocessing queue; on TPU a single jitted encode is SPMD
over the mesh (batch sharded on the data axis), so the pool disappears.
Prefixes, normalization, binarization, and matryoshka-dim slicing are
preserved.
"""

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np



def corpus_to_texts(corpus) -> List[str]:
    """BEIR/MTEB corpus entries ({title?, text} dicts or raw strings) to
    flat texts — shared by every encoder adapter so A/B comparisons use
    identical document formatting."""
    if corpus and isinstance(corpus[0], dict):
        return [(d.get("title", "") + " " + d["text"]).strip() for d in corpus]
    return list(corpus)


class Encoder:
    def __init__(
        self,
        module,
        params,
        tokenizer,
        seq_len: int = 512,
        batch_size: int = 64,
        query_prefix: Optional[str] = "search_query",
        document_prefix: Optional[str] = "search_document",
        normalize: bool = True,
        binarize: bool = False,
        matryoshka_dim: Optional[int] = None,
        mesh=None,
        bucketed: bool = True,
    ):
        self.module = module
        self.params = params
        self.tokenizer = tokenizer
        self.seq_len = seq_len
        self.batch_size = batch_size
        self.query_prefix = query_prefix
        self.document_prefix = document_prefix
        self.normalize = normalize
        self.binarize = binarize
        self.matryoshka_dim = matryoshka_dim
        self.mesh = mesh
        # length bucketing (r3 VERDICT next #7): sort by token length, pad
        # each batch to the next power-of-two bucket instead of seq_len —
        # at most log2(seq_len) compiled shapes, big win on mixed-length
        # corpora (every mini-MTEB/NanoBEIR eval pays this). Embeddings are
        # identical (pooling and attention mask out pads).
        self.bucketed = bucketed

        @jax.jit
        def _encode(params, ids, mask):
            out = module.apply(
                params,
                input_ids=ids,
                attention_mask=mask,
                normalize=False,
                deterministic=True,
            )
            return out["embedding"]

        self._encode_fn = _encode
        self._batch_sharding = None
        if mesh is not None and mesh.shape.get("data", 1) > 1:
            # shard eval batches over the data axis: the SPMD replacement for
            # the reference's one-worker-per-GPU encode pool
            # (reference eval/encoder.py:218-335)
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._batch_sharding = NamedSharding(mesh, P("data"))

    def _postprocess(self, emb: np.ndarray) -> np.ndarray:
        emb = emb.astype(np.float32)
        if self.matryoshka_dim:
            emb = emb[:, : self.matryoshka_dim]
        if self.binarize:
            return (emb > 0).astype(np.float32)
        if self.normalize:
            emb = emb / np.maximum(np.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        return emb

    def _run_batch(self, ids: np.ndarray, mask: np.ndarray) -> np.ndarray:
        ids = jnp.asarray(ids)
        mask = jnp.asarray(mask)
        if self._batch_sharding is not None:
            ids = jax.device_put(ids, self._batch_sharding)
            mask = jax.device_put(mask, self._batch_sharding)
        return np.asarray(self._encode_fn(self.params, ids, mask))

    @staticmethod
    def _bucket(n: int, cap: int) -> int:
        b = 16
        while b < n:
            b *= 2
        return min(b, cap)

    def encode(self, sentences: List[str], prefix: Optional[str] = None) -> np.ndarray:
        bs = self.batch_size
        if prefix:
            sentences = [f"{prefix}: {s}" for s in sentences]

        if not self.bucketed:
            out = []
            for start in range(0, len(sentences), bs):
                chunk = sentences[start : start + bs]
                texts = chunk + [""] * (bs - len(chunk))  # fixed shape
                enc = self.tokenizer(
                    texts, padding="max_length", truncation=True,
                    max_length=self.seq_len, return_tensors="np",
                )
                emb = self._run_batch(
                    enc["input_ids"].astype(np.int32),
                    enc["attention_mask"].astype(np.int32),
                )[: len(chunk)]
                out.append(emb)
            return self._postprocess(np.concatenate(out))

        # bucketed: tokenize once unpadded, sort by length, batch into
        # power-of-two shapes, un-sort at the end
        enc = self.tokenizer(
            sentences, padding=False, truncation=True, max_length=self.seq_len
        )
        ids_list = enc["input_ids"]
        lens = np.asarray([len(x) for x in ids_list], dtype=np.int64)
        order = np.argsort(-lens, kind="stable")
        pad_id = self.tokenizer.pad_token_id or 0
        chunks = []  # (positions, embeddings)
        for start in range(0, len(order), bs):
            idx = order[start : start + bs]
            L = self._bucket(int(lens[idx].max(initial=1)), self.seq_len)
            ids = np.full((bs, L), pad_id, dtype=np.int32)
            mask = np.zeros((bs, L), dtype=np.int32)
            for r, i in enumerate(idx):
                n = min(len(ids_list[i]), L)
                ids[r, :n] = ids_list[i][:n]
                mask[r, :n] = 1
            if len(idx) < bs:
                # fill shape-padding rows with the first real row (an all-pad
                # row would softmax over a fully-masked attention bias)
                ids[len(idx) :] = ids[0]
                mask[len(idx) :] = mask[0]
            chunks.append((idx, self._run_batch(ids, mask)[: len(idx)]))
        dim = chunks[0][1].shape[-1]
        embs = np.empty((len(sentences), dim), dtype=np.float32)
        for idx, emb in chunks:
            embs[idx] = emb
        return self._postprocess(embs)

    # MTEB / BEIR-style interface (reference encoder.py:106-160 STransformer)
    def encode_queries(self, queries: List[str], **kw) -> np.ndarray:
        return self.encode(queries, prefix=self.query_prefix)

    def encode_corpus(self, corpus, **kw) -> np.ndarray:
        return self.encode(corpus_to_texts(corpus), prefix=self.document_prefix)


class OpenAIEncoder:
    """Baseline adapter over the OpenAI embeddings API (reference
    eval/encoder.py:39-104 OpenAI_Encoder): token-budget truncation via
    tiktoken, chunked requests with one retry, MTEB/BEIR encode surface.
    Requires the `openai` + `tiktoken` packages and network — both absent
    from this image, so construction raises a clear error offline; the
    class exists so A/B tables against API models run unchanged in a
    connected environment."""

    def __init__(
        self,
        embedding_model: str = "text-embedding-ada-002",
        batch_size: int = 32,
        cutoff: int = 8192,
        retry_seconds: float = 30.0,
    ):
        try:
            import tiktoken
            from openai import OpenAI
        except ImportError as e:
            raise ImportError(
                "OpenAIEncoder needs the `openai` and `tiktoken` packages "
                "(and network access) — unavailable in this offline image"
            ) from e
        self.client = OpenAI()
        self.embedding_model = embedding_model
        self.encoding = tiktoken.get_encoding("cl100k_base")
        self.batch_size = batch_size
        self.cutoff = cutoff
        self.retry_seconds = retry_seconds

    def _truncate(self, text: str) -> str:
        toks = self.encoding.encode(text)
        return self.encoding.decode(toks[: self.cutoff]) if len(toks) > self.cutoff else text

    def encode(self, sentences: List[str], **kw) -> np.ndarray:
        import time

        sentences = [self._truncate(s) for s in sentences]
        out = []
        for start in range(0, len(sentences), self.batch_size):
            chunk = sentences[start : start + self.batch_size]
            try:
                resp = self.client.embeddings.create(input=chunk, model=self.embedding_model)
            except Exception:
                time.sleep(self.retry_seconds)
                resp = self.client.embeddings.create(input=chunk, model=self.embedding_model)
            out.extend(d.embedding for d in resp.data)
        return np.asarray(out, dtype=np.float32)

    def encode_queries(self, queries: List[str], **kw) -> np.ndarray:
        return self.encode(queries)

    def encode_corpus(self, corpus, **kw) -> np.ndarray:
        return self.encode(corpus_to_texts(corpus))


class HFEncoder:
    """Baseline adapter: any LOCAL HF checkpoint as an Encoder for A/B
    parity tables (reference eval/encoder.py:338-374 — AutoModel +
    mean pooling; CLIP text towers via get_text_features). Runs torch on
    CPU — it exists to benchmark external models against the TPU Encoder,
    not to be fast."""

    def __init__(
        self,
        model_name: str,
        seq_len: int = 512,
        batch_size: int = 16,
        normalize: bool = True,
        query_prefix: Optional[str] = None,
        document_prefix: Optional[str] = None,
    ):
        import torch
        from transformers import AutoModel, AutoTokenizer

        self._torch = torch
        self.model = AutoModel.from_pretrained(model_name, trust_remote_code=True)
        self.model.eval()
        self.tokenizer = AutoTokenizer.from_pretrained(model_name)
        self.clip_model = getattr(self.model.config, "model_type", "") == "clip"
        if self.tokenizer.model_max_length > seq_len:
            self.tokenizer.model_max_length = seq_len
        self.batch_size = batch_size
        self.normalize = normalize
        self.query_prefix = query_prefix
        self.document_prefix = document_prefix

    def encode(self, sentences: List[str], prefix: Optional[str] = None) -> np.ndarray:
        torch = self._torch
        if prefix:
            sentences = [f"{prefix}: {s}" for s in sentences]
        out = []
        with torch.no_grad():
            for start in range(0, len(sentences), self.batch_size):
                enc = self.tokenizer(
                    sentences[start : start + self.batch_size],
                    padding=True, truncation=True, return_tensors="pt",
                )
                if self.clip_model:
                    pooled = self.model.get_text_features(**enc)
                else:
                    hidden = self.model(**enc)[0]
                    m = enc["attention_mask"].unsqueeze(-1).to(hidden.dtype)
                    pooled = (hidden * m).sum(1) / m.sum(1).clamp(min=1e-9)
                out.append(pooled.float().numpy())
        emb = np.concatenate(out)
        if self.normalize:
            emb = emb / np.maximum(np.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        return emb

    def encode_queries(self, queries: List[str], **kw) -> np.ndarray:
        return self.encode(queries, prefix=self.query_prefix)

    def encode_corpus(self, corpus, **kw) -> np.ndarray:
        return self.encode(corpus_to_texts(corpus), prefix=self.document_prefix)
