# TPU-host serving image (reference Dockerfile analog: pytorch/cuda base ->
# JAX TPU base). Run on a TPU VM with /dev/accel* visible.
FROM python:3.11-slim
WORKDIR /app
COPY pyproject.toml README.md ./
COPY tensortruth_tpu ./tensortruth_tpu
RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir .
ENV TENSOR_TRUTH_TPU_DATA_DIR=/data
VOLUME /data
EXPOSE 8000
CMD ["tensor-truth-tpu", "--host", "0.0.0.0", "--port", "8000"]
