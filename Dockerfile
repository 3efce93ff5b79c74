# imcui-tpu serving image (reference contract: Dockerfile:1-18 — the
# reference builds on a pytorch/cuda base; the TPU rebuild targets the
# libtpu runtime).
FROM python:3.11-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    libgl1 libglib2.0-0 g++ cmake ninja-build && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY imcui_tpu ./imcui_tpu
COPY config ./config
COPY app.py bench.py ./

# TPU runtime: jax[tpu] pulls libtpu; on CPU-only hosts install plain jax.
RUN pip install --no-cache-dir "jax[tpu]" \
      -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    || pip install --no-cache-dir jax
RUN pip install --no-cache-dir -e ".[serve]"

EXPOSE 7860 8001
CMD ["python", "-m", "imcui_tpu.api.server"]
