"""Model-serving surface (SURVEY.md §3 E2; reference api/api.py).

The reference serves /train /predict /predict/batch /jobs /models via
FastAPI. Re-expressed as a framework-free ``ServingService`` (testable
without an HTTP stack — fastapi is optional in this environment) plus a
``build_app`` factory that mounts the same routes when fastapi is
importable.

Fixes the reference's serving anti-patterns:
 - /train blocked the request handler despite accepting BackgroundTasks
   (reference api/api.py:111-133) → training runs on a worker thread
   with a real job registry.
 - row-at-a-time collect stays ONLY at the request/response boundary
   (reference api/api.py:183-184 is the one legitimate collect).
"""

from __future__ import annotations

import threading
import time
import uuid
from typing import Any

from pyspark.ml import PipelineModel
from pyspark.sql import DataFrame

from .orchestrator import PipelineOrchestrator


class ServingService:
    """In-process serving core: job registry + model registry +
    single-row and batch prediction paths."""

    def __init__(self, orchestrator: PipelineOrchestrator | None = None):
        self.orchestrator = orchestrator or PipelineOrchestrator()
        self.jobs: dict[str, dict[str, Any]] = {}
        self.models: dict[str, PipelineModel] = {}
        self._lock = threading.Lock()

    # -- training jobs ------------------------------------------------------
    def submit_train(self, data_path: str, algorithm: str, task: str,
                     blocking: bool = False) -> dict[str, Any]:
        """Start a training job; returns the job record immediately
        (async by default — the reference's declared-but-unwired intent,
        api/api.py:112)."""
        job_id = uuid.uuid4().hex[:12]
        job = {"job_id": job_id, "status": "running", "algorithm": algorithm,
               "task": task, "submitted_at": time.time(), "metrics": None,
               "error": None}
        with self._lock:
            self.jobs[job_id] = job

        def run() -> None:
            try:
                df = self.orchestrator.load(data_path)
                model, metrics = self.orchestrator.train(df, algorithm, task)
                with self._lock:
                    self.models[job_id] = model
                    job.update(status="completed", metrics=metrics,
                               completed_at=time.time())
            except Exception as exc:  # noqa: BLE001 — job surface reports any failure
                job.update(status="failed", error=f"{type(exc).__name__}: {exc}",
                           completed_at=time.time())

        if blocking:
            run()
        else:
            threading.Thread(target=run, daemon=True).start()
        return job

    def job_status(self, job_id: str) -> dict[str, Any]:
        if job_id not in self.jobs:
            raise KeyError(f"unknown job {job_id!r}")
        return self.jobs[job_id]

    def list_jobs(self) -> list[dict[str, Any]]:
        return sorted(self.jobs.values(), key=lambda j: j["submitted_at"])

    # -- models -------------------------------------------------------------
    def register_model(self, name: str, model: PipelineModel | str) -> None:
        if isinstance(model, str):
            model = PipelineModel.load(model)
        with self._lock:
            self.models[name] = model

    def list_models(self) -> list[str]:
        return sorted(self.models)

    def delete_model(self, name: str) -> dict[str, Any]:
        """Remove a model from the in-process registry (reference
        api/api.py:281-292 ``DELETE /models/{model_path}`` — the
        reference's handler is a stub that answers "deleted" without
        touching anything; this registry is real, so unknown names
        raise KeyError → 404, consistent with /predict's lookup).
        Returns the reference's response shape."""
        with self._lock:
            if name not in self.models:
                raise KeyError(f"unknown model {name!r}")
            del self.models[name]
        return {"status": "deleted", "model_path": name}

    def list_models_with_registry(self) -> dict[str, Any]:
        """In-process model names plus, when mlflow is importable, the
        tracked runs from the MLflow registry (the reference's /models
        queries MLflow exclusively — api/api.py:244-267; we serve both
        so the endpoint is useful with or without a tracking server)."""
        out: dict[str, Any] = {"models": self.list_models(),
                               "registry": None}
        try:
            import mlflow

            client = mlflow.tracking.MlflowClient()
            runs = []
            for exp in client.search_experiments():
                for run in client.search_runs(exp.experiment_id):
                    runs.append({
                        "run_id": run.info.run_id,
                        "experiment_id": exp.experiment_id,
                        "metrics": run.data.metrics,
                        "params": run.data.params,
                        "start_time": run.info.start_time,
                    })
            out["registry"] = runs
        except Exception:  # noqa: BLE001 — registry is best-effort decoration
            pass  # mlflow absent or unreachable: in-process list stands alone
        return out

    # -- metrics ------------------------------------------------------------
    def metrics(self) -> dict[str, Any]:
        """Serving metrics from the job registry (reference
        api/api.py:270-278), extended with training-latency stats so
        the endpoint answers "how long do jobs take" without log
        spelunking."""
        with self._lock:
            jobs = [dict(j) for j in self.jobs.values()]
        by_status = {s: sum(1 for j in jobs if j["status"] == s)
                     for s in ("running", "completed", "failed")}
        durations = [
            j["completed_at"] - j["submitted_at"]
            for j in jobs
            if j.get("completed_at") is not None
        ]
        return {
            "total_training_jobs": len(jobs),
            "completed_jobs": by_status["completed"],
            "failed_jobs": by_status["failed"],
            "running_jobs": by_status["running"],
            "registered_models": len(self.models),
            "train_seconds_mean": (sum(durations) / len(durations)
                                   if durations else None),
            "train_seconds_max": max(durations, default=None),
            "timestamp": time.time(),
        }

    # -- prediction ---------------------------------------------------------
    def predict_rows(self, model_name: str, rows: list[list[float]],
                     feature_names: list[str]) -> list[float]:
        """JSON floats → DataFrame → transform → list (the serving
        boundary is the only place collect() is allowed — reference
        api/api.py:176-184)."""
        model = self.models[model_name]
        df = self.orchestrator.spark.createDataFrame(
            [tuple(float(v) for v in r) for r in rows], list(feature_names)
        )
        out = model.transform(df)
        return [float(r["prediction"]) for r in out.select("prediction").collect()]

    def predict_batch(self, model_name: str, input_path: str,
                      output_path: str) -> dict[str, Any]:
        """Fully distributed scoring: load → transform → parquet sink;
        never collects (reference api/api.py:196-223)."""
        model = self.models[model_name]
        df = self.orchestrator.load(input_path)
        out: DataFrame = model.transform(df).drop("features", "features_raw")
        out.write.mode("overwrite").parquet(output_path)
        return {"model": model_name, "input": input_path, "output": output_path}


def build_app(service: ServingService | None = None):
    """FastAPI app with the reference's routes; import-gated because
    fastapi is an optional dependency here."""
    try:
        from fastapi import FastAPI, HTTPException
    except ImportError as exc:  # pragma: no cover - optional dep
        raise RuntimeError(
            "fastapi is not installed; use ServingService directly or "
            "install fastapi+uvicorn for the HTTP surface"
        ) from exc

    service = service or ServingService()
    app = FastAPI(title="big-data-ml-pipeline-spark")

    @app.get("/health")
    def health():
        return {"status": "ok"}

    @app.post("/train")
    def train(body: dict):
        (data_path,) = _require(body, "data_path")
        return service.submit_train(
            data_path, body.get("algorithm", "random_forest"),
            body.get("task", "classification"),
        )

    @app.get("/jobs")
    def jobs():
        return service.list_jobs()

    @app.get("/jobs/{job_id}")
    def job(job_id: str):
        try:
            return service.job_status(job_id)
        except KeyError:
            raise HTTPException(404, "unknown job")

    @app.get("/models")
    def models():
        return service.list_models_with_registry()

    @app.get("/metrics")
    def metrics():
        return service.metrics()

    @app.delete("/models/{model_path}")
    def delete_model(model_path: str):
        try:
            return service.delete_model(model_path)
        except KeyError:
            raise HTTPException(404, f"unknown model: {model_path!r}")

    def _require(body: dict, *keys: str) -> list:
        """Missing request-body keys are a 422 (malformed request), not
        a 404 — the previous blanket `except KeyError` conflated them
        with unknown-model lookups (ADVICE r1)."""
        missing = [k for k in keys if k not in body]
        if missing:
            raise HTTPException(422, f"missing request fields: {missing}")
        return [body[k] for k in keys]

    @app.post("/predict")
    def predict(body: dict):
        model, features, feature_names = _require(
            body, "model", "features", "feature_names"
        )
        try:
            preds = service.predict_rows(model, features, feature_names)
        except KeyError:
            raise HTTPException(404, f"unknown model: {model!r}")
        return {"predictions": preds}

    @app.post("/predict/batch")
    def predict_batch(body: dict):
        model, input_path, output_path = _require(
            body, "model", "input_path", "output_path"
        )
        try:
            return service.predict_batch(model, input_path, output_path)
        except KeyError:
            raise HTTPException(404, f"unknown model: {model!r}")

    return app
