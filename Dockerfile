# Training image for add_gym_tpu on Cloud TPU VMs.
# Counterpart of the reference's Dockerfile (CUDA base + uv sync): here the
# base ships JAX with the TPU runtime; assets are mounted or baked via
# ADD_GYM_TPU_ASSETS.
ARG BASE_IMAGE=python:3.12-slim
FROM ${BASE_IMAGE}

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml ./
RUN pip install --no-cache-dir \
        "jax[tpu]" flax optax orbax-checkpoint chex einops pyyaml \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

COPY add_gym_tpu ./add_gym_tpu
COPY bench.py tpu-entrypoint.sh ./
RUN make -B -C add_gym_tpu/native   # native data loader (ctypes .so)

ENV PYTHONPATH=/app
ENTRYPOINT ["bash", "tpu-entrypoint.sh"]
