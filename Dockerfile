# Runtime image for the semcode-tpu API service.
# On TPU VMs, base this on a jax[tpu]-provisioned image instead; the CPU
# fallback below is for functional (non-performance) deployments and CI.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ zlib1g-dev make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY semcode_tpu ./semcode_tpu
COPY native ./native

RUN pip install --no-cache-dir "jax[cpu]" flax optax numpy "pydantic>=2" \
    aiohttp rich httpx \
    && pip install --no-cache-dir -e . \
    && (g++ -O3 -shared -fPIC -o native/libsemcode_native.so \
        native/featurizer.cpp -lz || true)

EXPOSE 8000
ENV SEMCODE_API_HOST=0.0.0.0 SEMCODE_API_PORT=8000
CMD ["python", "-m", "semcode_tpu.api.main"]
