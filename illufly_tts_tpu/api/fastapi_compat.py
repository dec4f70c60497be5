# -*- coding: utf-8 -*-
"""FastAPI mount shim — preserves the reference's integration surface
(``mount_tts_service(app, ...)``, reference src/illufly_tts/api/endpoints.py:43)
for hosts that run FastAPI. Import requires fastapi to be installed."""
from __future__ import annotations

import asyncio
import logging
import os
import tempfile
from typing import Optional

from fastapi import APIRouter, FastAPI, HTTPException, Request
from pydantic import BaseModel

from ..runtime.scheduler import TTSServiceManager
from .auth import AuthError, authenticate
from .dev_mode import generate_dev_token, is_dev_mode
from .endpoints import _process_tts_request

logger = logging.getLogger(__name__)


class TextToSpeechRequest(BaseModel):
    text: str
    voice_id: str = "zf_001"
    speed: float = 1.0
    # float like the scheduler's TTSTask.sequence_id (time.time()-style
    # ids must not 422 here when the aiohttp mount accepts them)
    sequence_id: Optional[float] = None
    cancel_pending: bool = False


def _user_of(request: Request):
    try:
        return authenticate(
            dict(request.headers), dict(request.cookies),
            dict(request.query_params),
        )
    except AuthError as exc:
        raise HTTPException(status_code=exc.status, detail=exc.detail)


def mount_tts_service(
    app: FastAPI,
    repo_id: str = "",
    voices_dir: Optional[str] = None,
    device: Optional[str] = None,
    batch_size: int = 4,
    max_wait_time: float = 0.2,
    chunk_size: int = 200,
    output_dir: Optional[str] = None,
    prefix: str = "/api",
) -> None:
    router = APIRouter()
    if not output_dir:
        output_dir = os.path.join(tempfile.gettempdir(), "illufly_tts_output")
        os.makedirs(output_dir, exist_ok=True)

    @app.on_event("startup")
    async def startup():
        app.state.service_manager = TTSServiceManager(
            repo_id=repo_id, voices_dir=voices_dir, device=device,
            batch_size=batch_size, max_wait_time=max_wait_time,
            chunk_size=chunk_size, output_dir=output_dir,
        )
        synth = app.state.service_manager.pipeline.synthesizer
        if not synth.is_voice_loaded("zf_001"):
            synth.register_random_voice("zf_001", seed=42)
        await app.state.service_manager.start()

    @router.post("/tts")
    async def text_to_speech(body: TextToSpeechRequest, request: Request):
        user = _user_of(request)
        manager = app.state.service_manager
        user_id = user.get("user_id")
        if body.cancel_pending and user_id:
            await manager.cancel_user_pending_tasks(user_id)
        result = await _process_tts_request(
            manager, body.text, body.voice_id, user_id, body.sequence_id,
            body.speed,
        )
        if result["status"] == "error":
            err = result["error"] or "synthesis failed"
            # voice problems are the caller's fault; device/batch errors
            # are server faults and must be 5xx (see endpoints.py)
            code = 400 if "voice" in err.lower() else 500
            raise HTTPException(status_code=code, detail=err)
        return result

    @router.get("/tts/voices")
    async def get_voices(request: Request):
        _user_of(request)
        names = app.state.service_manager.pipeline.list_voices() or ["zf_001"]
        return {"voices": [
            {"id": n, "name": n, "description": f"voice {n}"}
            for n in names if not n.startswith("__")
        ]}

    @router.get("/tts/info")
    async def get_info(request: Request):
        _user_of(request)
        return {
            "service": "illufly-tts-tpu-service",
            "version": "0.1.0",
            "model": repo_id or "kokoro-82M-class (random init)",
            "device": device or "tpu",
            "batch_size": batch_size,
            "max_wait_time": max_wait_time,
            "chunk_size": chunk_size,
        }

    app.include_router(router, prefix=prefix)

    if is_dev_mode():
        dev = APIRouter()

        @dev.post("/dev/token")
        async def dev_token(body: dict = None):
            body = body or {}
            user_id = body.get("user_id", "dev_user")
            minutes = int(body.get("expire_minutes", 60 * 24))
            return {
                "access_token": generate_dev_token(user_id, minutes),
                "token_type": "bearer",
                "user_id": user_id,
                "expires_in": minutes * 60,
            }

        @dev.get("/dev/status")
        async def dev_status():
            return {"dev_mode": True}

        app.include_router(dev, prefix=prefix)

    @app.on_event("shutdown")
    async def shutdown():
        if hasattr(app.state, "service_manager"):
            await app.state.service_manager.shutdown()
