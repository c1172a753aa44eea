# Runtime image (analogue of the reference's Dockerfile, minus CUDA):
# pure-Python JAX framework + the on-demand-built native scene compiler.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace
COPY pyproject.toml README.md ./
COPY gpudrive_lab_tpu ./gpudrive_lab_tpu
COPY csrc ./csrc
COPY bench.py bench_scaling.py __graft_entry__.py ./
COPY tests ./tests
COPY examples ./examples

RUN pip install --no-cache-dir -e .[dev]

# Smoke: contract tests on the bundled synthetic fixture + CPU bench
RUN python -m pytest tests/ -q && \
    python bench.py --smoke --scenes-dir tests/data

CMD ["python", "bench.py", "--smoke", "--scenes-dir", "tests/data"]
