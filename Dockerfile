# mockingbird_tpu container (parity with the reference's Dockerfile +
# docker-entrypoint.sh: preprocess → train → serve flow).
#
# For TPU VMs use a jax[tpu]-enabled base; this CPU image covers serving,
# preprocessing and tests.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential make && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /workspace
COPY pyproject.toml README.md ./
COPY mockingbird_tpu ./mockingbird_tpu
COPY native ./native
COPY bench.py ./

RUN pip install --no-cache-dir "jax[cpu]" flax optax orbax-checkpoint numpy scipy \
    && pip install --no-cache-dir -e . \
    && make -C native

EXPOSE 8080
COPY docker-entrypoint.sh /docker-entrypoint.sh
RUN chmod +x /docker-entrypoint.sh
ENTRYPOINT ["/docker-entrypoint.sh"]
