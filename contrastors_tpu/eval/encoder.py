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

    def encode(self, sentences: List[str], prefix: Optional[str] = None) -> np.ndarray:
        out = []
        bs = self.batch_size
        if prefix:
            sentences = [f"{prefix}: {s}" for s in sentences]
        for start in range(0, len(sentences), bs):
            chunk = sentences[start : start + bs]
            pad_to = bs  # fixed shape => one compiled program
            texts = chunk + [""] * (pad_to - len(chunk))
            enc = self.tokenizer(
                texts, padding="max_length", truncation=True,
                max_length=self.seq_len, return_tensors="np",
            )
            ids = jnp.asarray(enc["input_ids"].astype(np.int32))
            mask = jnp.asarray(enc["attention_mask"].astype(np.int32))
            if self._batch_sharding is not None:
                ids = jax.device_put(ids, self._batch_sharding)
                mask = jax.device_put(mask, self._batch_sharding)
            emb = np.asarray(self._encode_fn(self.params, ids, mask))[: len(chunk)]
            out.append(emb)
        return self._postprocess(np.concatenate(out))

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
