"""LLM plumbing (SURVEY.md §2.4 D3, reference
src/prompt/llm_integration.rs:96-325): provider request shaping +
bounded retry with exponential backoff, and the Arrow-batched scoring
stage that runs an injectable scorer over DataFrame partitions.

No network access in this environment: the transport is injectable
(`transport(url, headers, body) -> response_text`); tests use fakes.
The reference's constants are preserved: 3 retries, 500ms * 2^k
backoff (llm_integration.rs:119-143), 120s timeout.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

MAX_RETRIES = 3
BACKOFF_BASE_MS = 500
TIMEOUT_SEC = 120


@dataclass
class LLMConfig:
    provider: str = "openai"  # openai | anthropic | azure | ollama | custom
    model: str = "gpt-4o-mini"
    api_key: str = ""
    base_url: str = ""
    # Provider-specific headers (auth schemes, API-version pins, beta
    # flags) are deliberately caller-supplied in full (name AND value) —
    # this module never hardcodes a provider header key.
    extra_headers: dict[str, str] = field(default_factory=dict)


def shape_request(prompt: str, cfg: LLMConfig) -> tuple[str, dict[str, str], str]:
    """(url, headers, body) per provider — mirrors the per-provider
    endpoint/header/body shaping (llm_integration.rs:96-205)."""
    if cfg.provider == "anthropic":
        url = (cfg.base_url or "https://api.anthropic.com") + "/v1/messages"
        headers = {
            "x-api-key": cfg.api_key,
            "content-type": "application/json",
        }
        body = json.dumps(
            {
                "model": cfg.model,
                "max_tokens": 4096,
                "messages": [{"role": "user", "content": prompt}],
            }
        )
    elif cfg.provider == "ollama":
        url = (cfg.base_url or "http://localhost:11434") + "/api/generate"
        headers = {"content-type": "application/json"}
        body = json.dumps({"model": cfg.model, "prompt": prompt, "stream": False})
    else:  # openai-compatible (openai | azure | custom)
        url = (cfg.base_url or "https://api.openai.com") + "/v1/chat/completions"
        headers = {
            "authorization": f"Bearer {cfg.api_key}",
            "content-type": "application/json",
        }
        body = json.dumps(
            {
                "model": cfg.model,
                "messages": [{"role": "user", "content": prompt}],
            }
        )
    headers.update(cfg.extra_headers)
    return url, headers, body


def parse_response(provider: str, response_text: str) -> str:
    """Extract the completion text per provider response shape."""
    data = json.loads(response_text)
    if provider == "anthropic":
        return data["content"][0]["text"]
    if provider == "ollama":
        return data["response"]
    return data["choices"][0]["message"]["content"]


class LLMError(RuntimeError):
    pass


def query_llm(
    prompt: str,
    cfg: LLMConfig,
    transport: Callable[[str, dict, str], str],
    sleep=time.sleep,
) -> str:
    """Bounded retry with exponential backoff: 3 attempts,
    500ms * 2^k between failures (llm_integration.rs:119-143)."""
    url, headers, body = shape_request(prompt, cfg)
    last_err: Exception | None = None
    for attempt in range(MAX_RETRIES):
        try:
            return parse_response(cfg.provider, transport(url, headers, body))
        except Exception as e:  # noqa: BLE001 — any transport/parse failure retries
            last_err = e
            if attempt < MAX_RETRIES - 1:
                sleep(BACKOFF_BASE_MS * (2**attempt) / 1000.0)
    raise LLMError(f"LLM query failed after {MAX_RETRIES} attempts: {last_err}")


# --- the batched scoring stage (north_star: "batched mention-detect +
# entity-link scoring stage") -------------------------------------------------


def batch_score(
    df,
    score_batch: Callable,  # pandas.DataFrame -> pandas.DataFrame
    output_schema: str,
    retries: int = MAX_RETRIES,
):
    """Run a batch scorer over Arrow batches via mapInPandas with
    per-batch retry — the Spark-side shape of an LLM/model scoring
    stage. `score_batch` must be deterministic-or-idempotent (retries
    re-submit the whole batch)."""

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            last = None
            for attempt in range(retries):
                try:
                    yield score_batch(pdf)
                    break
                except Exception as e:  # noqa: BLE001
                    last = e
                    if attempt == retries - 1:
                        raise LLMError(
                            f"batch scoring failed after {retries} attempts: {last}"
                        ) from e
                    time.sleep(BACKOFF_BASE_MS * (2**attempt) / 1000.0)

    return df.mapInPandas(run, schema=output_schema)
