# Container packaging for the PySpark engine + serving surface.
# Parity with the reference's deployment artifact (Dockerfile + docker/
# Dockerfile there), re-based for a JVM+PySpark runtime: the reference
# ships a pandas/uvicorn process; this image carries Java 17 for Spark
# local mode and installs the package with its serving/online extras.

FROM python:3.12-slim

ENV PYTHONDONTWRITEBYTECODE=1 \
    PYTHONUNBUFFERED=1 \
    PIP_NO_CACHE_DIR=1

# Java 17 for the Spark JVM; libgomp1 for optional LightGBM scoring.
RUN apt-get update && apt-get install -y --no-install-recommends \
        openjdk-17-jre-headless libgomp1 ca-certificates && \
    rm -rf /var/lib/apt/lists/*
ENV JAVA_HOME=/usr/lib/jvm/java-17-openjdk-amd64

WORKDIR /code

COPY pyproject.toml /code/pyproject.toml
COPY retailfeaturestore_spark /code/retailfeaturestore_spark
RUN pip install --upgrade pip && pip install ".[serving,online,dev]"

COPY tools /code/tools
COPY tests /code/tests
COPY __spark_entry__.py bench.py /code/

# Online store config (app_from_env contract): FEATURE_BACKEND=redis reads
# REDIS_URL (default redis://localhost:6379/0) + REDIS_KEY_PREFIX and falls
# back to the offline parquet service per-request on miss/outage; set
# FEATURE_BACKEND=offline to skip Redis entirely.  REDIS_TTL_SECONDS is the
# MATERIALIZER's knob (sources/redis_sink.py), not a serving one.
ENV FEATURE_BACKEND=redis
EXPOSE 7860

# Serving entrypoint: uvicorn app when the serving extra is installed
# (create_app falls back to a clear error otherwise).  PORT is injected by
# most PaaS runtimes; default matches the reference's 7860.
CMD ["sh", "-c", "uvicorn --factory retailfeaturestore_spark.serving.app:app_from_env --host 0.0.0.0 --port ${PORT:-7860}"]
