# -*- coding: utf-8 -*-
"""HTTP service layer (aiohttp-native; FastAPI mount available via
fastapi_compat when fastapi is installed).

Route/response parity with the reference (src/illufly_tts/api/endpoints.py:
32-254): POST {prefix}/tts (submit -> poll -> base64 WAV JSON),
GET {prefix}/tts/voices, GET {prefix}/tts/info, dev routes, cancel_pending
semantics, JWT via cookie or bearer. TPU improvement: audio is served from
in-memory chunks — no wav write->read round-trip (the on-disk output_dir
copy is still written for parity)."""
from __future__ import annotations

import asyncio
import base64
import json
import logging
import os
import tempfile
import time
from typing import Any, Dict, Optional

import numpy as np
from aiohttp import web

from ..audio.wav import encode_wav
from ..runtime.scheduler import TTSServiceManager
from .auth import AuthError, authenticate
from .dev_endpoints import add_dev_routes
from .dev_mode import is_dev_mode
from .http_common import (
    is_client_fault,
    json_object,
    parse_pitch,
    parse_speed,
)

logger = logging.getLogger(__name__)

SERVICE_VERSION = "0.1.0"


# shared with the engine-free gateway (see http_common.py docstring)
_json_object = json_object
_parse_speed = parse_speed
_parse_pitch = parse_pitch


def make_cors_middleware(cors_origins: str):
    """Browser-correct CORS for `serve` (TTS_CORS_ORIGINS): answers
    OPTIONS preflights (no OPTIONS routes exist, so they 405'd and the
    browser blocked every cross-origin POST), echoes the single matching
    origin (a comma list or '*' with credentials is browser-rejected),
    and decorates error responses too (or the browser hides the status
    from JS)."""
    allowed = {o.strip() for o in cors_origins.split(",") if o.strip()}

    def cors_headers(request: web.Request) -> Dict[str, str]:
        origin = request.headers.get("Origin", "")
        if origin in allowed:
            # explicitly-listed origin: echo it and allow the JWT cookie
            return {"Access-Control-Allow-Origin": origin,
                    "Vary": "Origin",
                    "Access-Control-Allow-Credentials": "true"}
        if "*" in allowed:
            # wildcard: literal '*' WITHOUT credentials — reflecting the
            # origin + Allow-Credentials would re-enable the credentialed
            # wildcard browsers forbid (any site could ride the
            # access_token cookie of a logged-in user cross-site)
            return {"Access-Control-Allow-Origin": "*"}
        return {}

    @web.middleware
    async def cors_middleware(request, handler):
        hdrs = cors_headers(request)
        if request.method == "OPTIONS":
            hdrs.update({
                "Access-Control-Allow-Methods": "GET, POST, OPTIONS",
                "Access-Control-Allow-Headers": request.headers.get(
                    "Access-Control-Request-Headers",
                    "Authorization, Content-Type",
                ),
                "Access-Control-Max-Age": "600",
            })
            return web.Response(status=204, headers=hdrs)
        try:
            response = await handler(request)
        except web.HTTPException as exc:
            exc.headers.update(hdrs)
            raise
        response.headers.update(hdrs)
        return response

    return cors_middleware


def _require_user(request: web.Request) -> Dict[str, Any]:
    try:
        return authenticate(
            request.headers, request.cookies, request.query
        )
    except AuthError as exc:
        raise web.HTTPUnauthorized(
            reason=exc.detail
        ) if exc.status == 401 else web.HTTPForbidden(reason=exc.detail)


async def _process_tts_request(
    manager: TTSServiceManager,
    text: str,
    voice_id: str,
    user_id: Optional[str],
    sequence_id: Optional[float],
    speed: float = 1.0,
    output_format: str = "f32",
    return_timestamps: bool = False,
    pitch: float = 1.0,
    wire_encode: str = "wav",
) -> Dict[str, Any]:
    task_id = await manager.submit_task(
        text=text, voice_id=voice_id, speed=speed, user_id=user_id,
        sequence_id=sequence_id, output_format=output_format,
        return_timestamps=return_timestamps, pitch=pitch,
    )
    # bounded poll: a wedged device/batch must surface as an error, not
    # hang the HTTP request forever (the reference polls unbounded,
    # endpoints.py:109-113). Generous default — a cold compile of a
    # fresh bucket through the remote tunnel can take minutes.
    try:
        timeout_s = float(os.environ.get("TTS_REQUEST_TIMEOUT", "600"))
    except ValueError:
        # a misconfigured env var must not fail every request (the
        # handler's ValueError catch would 400 a server-side mistake)
        logger.warning("invalid TTS_REQUEST_TIMEOUT %r; using 600",
                       os.environ.get("TTS_REQUEST_TIMEOUT"))
        timeout_s = 600.0
    deadline = time.monotonic() + timeout_s if timeout_s > 0 else None
    while True:
        status = await manager.get_task_status(task_id)
        if status["status"] in ("completed", "failed", "canceled"):
            break
        if deadline is not None and time.monotonic() > deadline:
            await manager.cancel_task(task_id)
            return {
                "status": "error",
                "task_id": task_id,
                "error": f"request timed out after {timeout_s:.0f}s",
                # structured flag: handlers map THIS to 504 — substring
                # matching would confuse device errors mentioning
                # timeouts with the poll bound
                "timeout": True,
            }
        await asyncio.sleep(0.05)
    if status["status"] != "completed":
        return {
            "status": "error",
            "task_id": task_id,
            "error": status.get("error") or "processing failed",
        }
    task = manager.tasks[task_id]
    if not task.audio_chunks:
        return {"status": "error", "task_id": task_id,
                "error": "no audio generated"}
    # duck-typed pipelines (create_app(pipeline=...) extension point) may
    # not implement output_rate — same fallback the scheduler uses
    rate_of = getattr(manager.pipeline, "output_rate", None)
    rate = (rate_of(task.output_format) if rate_of
            else manager.pipeline.sample_rate)
    if task.output_format == "mulaw8k":
        from ..audio.wav import encode_wav_mulaw

        wav_bytes = encode_wav_mulaw(task.audio_chunks[0], rate)
        wire_fmt = "mulaw"
    elif wire_encode == "flac":
        # lossless FLAC body in the same JSON envelope: roughly half the
        # base64 payload of the WAV for speech, bit-identical samples
        from ..audio.flac import encode_flac

        audio = np.asarray(task.audio_chunks[0])
        if audio.dtype != np.int16:
            audio = audio.astype(np.float32)
            peak = np.max(np.abs(audio)) if audio.size else 0.0
            if peak > 1.0:
                audio = audio / peak
            # same clip+round quantization as encode_wav and the
            # on-device pcm16 path (kokoro.py decode) — every quantizer in
            # the package agrees bit-for-bit (ADVICE r3)
            audio = np.round(
                np.clip(audio, -1.0, 1.0) * 32767.0
            ).astype(np.int16)
        wav_bytes = await asyncio.to_thread(encode_flac, audio, rate)
        wire_fmt = "flac"
    else:
        wav_bytes = encode_wav(task.audio_chunks[0], rate)
        wire_fmt = "pcm16"
    out = {
        "status": "success",
        "task_id": task_id,
        "audio_base64": base64.b64encode(wav_bytes).decode("ascii"),
        "sample_rate": rate,
        "format": wire_fmt,
        "created_at": status["created_at"],
        "completed_at": status["completed_at"],
    }
    if return_timestamps:
        out["timestamps"] = task.timestamps
    return out


def create_app(
    repo_id: str = "",
    voices_dir: Optional[str] = None,
    device: Optional[str] = None,
    batch_size: int = 4,
    max_wait_time: float = 0.2,
    chunk_size: int = 200,
    output_dir: Optional[str] = None,
    prefix: str = "/api",
    pipeline=None,
    register_default_voice: bool = True,
    wire_format: Optional[str] = None,
    british: bool = False,
) -> web.Application:
    """Build the aiohttp application serving the TTS API."""
    if not output_dir:
        output_dir = os.path.join(tempfile.gettempdir(), "illufly_tts_output")
        os.makedirs(output_dir, exist_ok=True)

    app = web.Application()
    app["config"] = {
        "repo_id": repo_id,
        "device": device or "tpu",
        "batch_size": batch_size,
        "max_wait_time": max_wait_time,
        "chunk_size": chunk_size,
    }

    async def startup(app: web.Application) -> None:
        manager = TTSServiceManager(
            repo_id=repo_id,
            voices_dir=voices_dir,
            device=device,
            batch_size=batch_size,
            max_wait_time=max_wait_time,
            chunk_size=chunk_size,
            output_dir=output_dir,
            pipeline=pipeline,
            wire_format=wire_format,
            british=british,
        )
        if register_default_voice:
            synth = manager.pipeline.synthesizer
            if not synth.is_voice_loaded("zf_001"):
                synth.register_random_voice("zf_001", seed=42)
                logger.warning(
                    "no zf_001 voice pack found; registered a synthetic "
                    "voice (provide --voices-dir for real voices)"
                )
        from ..audio.flac import prewarm as _flac_prewarm

        # build the native FLAC encoder off the request path (ADVICE r3:
        # the lazy g++ build cost up to 120 s inside the first request)
        _flac_prewarm()
        if os.environ.get("TTS_WARMUP", "").lower() in ("1", "true", "yes"):
            # precompile the common bucket inventory before taking traffic
            # (SURVEY §7 hard-part 5: warm buckets or tail latency explodes)
            warmup = getattr(
                manager.pipeline.synthesizer, "warmup", None
            )
            if callable(warmup):
                logger.info("warming compiled bucket inventory...")
                # warm a slim inventory AND narrow the dispatcher to it
                # (narrow=True, Synthesizer.warmup docstring): every
                # steady-state shape is then warm; partial batches /
                # short texts / short utterances pad to a warm bucket
                # instead of cold-compiling at traffic time. absorb=True
                # runs one throwaway call so the tunnel drain completes
                # before traffic arrives (absorb_drain). Formats: PCM
                # requests dispatch mulaw24k stage B when the wire codec
                # is on, and mulaw8k is API-reachable (format=mulaw8k
                # telephony) — warm what traffic will actually hit.
                fmts = (
                    ("mulaw24k", "mulaw8k")
                    if wire_format == "mulaw24k"
                    else ("pcm16", "mulaw8k")
                )
                staged = getattr(
                    manager.pipeline.synthesizer, "warmup_staged", None
                )
                if callable(staged):
                    # restart-optimized: primary program sync (traffic
                    # can flow after ONE executable load), rest of the
                    # inventory warms on a background thread — shapes pad
                    # to the primary bucket until it lands
                    pri_s, _ = await asyncio.to_thread(
                        lambda: staged(
                            batch_sizes=tuple(sorted({1, batch_size})),
                            token_sizes=(64, 256),
                            frame_sizes=(256, 512),
                            formats=fmts,
                            absorb=True,
                            narrow=True,
                        )
                    )
                    logger.info(
                        "primary program warm in %.1fs; background "
                        "warmup running", pri_s,
                    )
                else:
                    await asyncio.to_thread(
                        lambda: warmup(
                            batch_sizes=tuple(sorted({1, batch_size})),
                            token_sizes=(64, 256),
                            frame_sizes=(256, 512),
                            formats=fmts,
                            absorb=True,
                            narrow=True,
                        )
                    )
                    logger.info("warmup complete")
        await manager.start()
        app["service_manager"] = manager
        logger.info("TTS service started")

    async def cleanup(app: web.Application) -> None:
        manager = app.get("service_manager")
        if manager is not None:
            await manager.shutdown()

    app.on_startup.append(startup)
    app.on_cleanup.append(cleanup)

    async def text_to_speech(request: web.Request) -> web.Response:
        user = _require_user(request)
        body = await _json_object(request)
        text = body.get("text")
        if not text:
            raise web.HTTPBadRequest(reason="missing 'text'")
        voice_id = body.get("voice_id", "zf_001")
        speed = _parse_speed(body)
        sequence_id = body.get("sequence_id")
        cancel_pending = bool(body.get("cancel_pending", False))
        # 'wav' (24 kHz 16-bit PCM, default), 'mulaw8k' (G.711 @8 kHz,
        # telephony: 6x smaller payloads, same WAV container, format 7),
        # or 'flac' (lossless, ~half the WAV payload in the same JSON
        # envelope; audio/flac.py). PCM responses are 16-bit WAVs either
        # way, so the device quantizes on-chip ('pcm16': same peak policy
        # as encode_wav) — half the device->host transfer of f32 and no
        # host-side quantization pass
        fmt_req = body.get("format", "wav")
        fmt_map = {"wav": "pcm16", "pcm16": "pcm16", "mulaw8k": "mulaw8k",
                   "flac": "pcm16"}
        if fmt_req not in fmt_map:
            raise web.HTTPBadRequest(
                reason=f"unknown format {fmt_req!r}; use wav|mulaw8k|flac"
            )
        output_format = fmt_map[fmt_req]

        manager: TTSServiceManager = request.app["service_manager"]
        user_id = user.get("user_id")
        if cancel_pending and user_id:
            canceled = await manager.cancel_user_pending_tasks(user_id)
            logger.info("canceled %d pending tasks for %s", canceled, user_id)
        try:
            result = await _process_tts_request(
                manager, text, voice_id, user_id, sequence_id, speed,
                output_format,
                return_timestamps=bool(body.get("return_timestamps", False)),
                pitch=_parse_pitch(body),
                wire_encode="flac" if fmt_req == "flac" else "wav",
            )
        except ValueError as exc:
            # submit-time capability rejections (e.g. return_timestamps on
            # a pipeline without the split-phase surface) are caller-visible
            raise web.HTTPBadRequest(reason=str(exc))
        if result["status"] == "error":
            # voice problems are the caller's fault (4xx); everything
            # else — device/compile/batch errors — is a server fault and
            # must be 5xx so clients retry and dashboards classify right
            err = result["error"] or "synthesis failed"
            if is_client_fault(err):
                raise web.HTTPBadRequest(reason=err)
            if result.get("timeout"):
                raise web.HTTPGatewayTimeout(reason=err)
            raise web.HTTPInternalServerError(reason=err)
        return web.json_response(result)

    async def get_voices(request: web.Request) -> web.Response:
        _require_user(request)
        manager: TTSServiceManager = request.app["service_manager"]
        names = manager.pipeline.list_voices() or ["zf_001"]
        voices = [
            {"id": n, "name": n, "description": f"voice {n}"} for n in names
            if not n.startswith("__")
        ]
        return web.json_response({"voices": voices})

    async def get_info(request: web.Request) -> web.Response:
        _require_user(request)
        cfg = request.app["config"]
        return web.json_response({
            "service": "illufly-tts-tpu-service",
            "version": SERVICE_VERSION,
            "model": cfg["repo_id"] or "kokoro-82M-class (random init)",
            "device": cfg["device"],
            "batch_size": cfg["batch_size"],
            "max_wait_time": cfg["max_wait_time"],
            "chunk_size": cfg["chunk_size"],
        })

    async def get_stats(request: web.Request) -> web.Response:
        _require_user(request)
        manager: TTSServiceManager = request.app["service_manager"]
        return web.json_response(manager.stats())

    async def get_metrics(request: web.Request) -> web.Response:
        """Prometheus exposition of the same counters `/tts/stats` serves
        as JSON. Scrapers rarely carry JWTs, so `TTS_METRICS_PUBLIC=1`
        (typically paired with a loopback/VPC bind) lifts auth for this
        one read-only route; default requires the usual token."""
        if os.environ.get("TTS_METRICS_PUBLIC", "").lower() not in (
            "1", "true", "yes",
        ):
            _require_user(request)
        manager: TTSServiceManager = request.app["service_manager"]
        from ..utils.prometheus import render_prometheus

        return web.Response(
            text=render_prometheus(manager.stats()),
            content_type="text/plain",
            charset="utf-8",
        )

    async def tts_stream(request: web.Request) -> web.StreamResponse:
        """Chunked streaming synthesis: long text is segmented, each segment
        synthesized in scheduler order, and PCM streamed as it completes
        (the reference only streams at the library level, SURVEY §3.4)."""
        user = _require_user(request)
        body = await _json_object(request)
        text = body.get("text")
        if not text:
            raise web.HTTPBadRequest(reason="missing 'text'")
        voice_id = body.get("voice_id", "zf_001")
        speed = _parse_speed(body)
        pitch = _parse_pitch(body)
        return_timestamps = bool(body.get("return_timestamps", False))
        manager: TTSServiceManager = request.app["service_manager"]
        user_id = user.get("user_id")

        segments = manager.pipeline.segment_text(text, manager.chunk_size)
        # epoch base like submit_task's default — a monotonic-clock base
        # (~uptime) would sort every segment ahead of the user's earlier
        # epoch-stamped /tts tasks in the per-user heap; millisecond
        # steps keep the segments themselves in order
        base_seq = time.time()
        task_ids = []
        try:
            for i, segment in enumerate(segments):
                task_ids.append(
                    await manager.submit_task(
                        segment, voice_id, speed, user_id,
                        sequence_id=base_seq + i * 1e-3,
                        return_timestamps=return_timestamps, pitch=pitch,
                    )
                )
        except ValueError as exc:  # submit-time capability/range checks
            raise web.HTTPBadRequest(reason=str(exc))

        import struct

        import numpy as np

        rate = manager.pipeline.sample_rate

        def to_pcm16(chunk: "np.ndarray") -> "np.ndarray":
            if chunk.dtype == np.int16:
                return chunk.astype("<i2")
            peak = float(np.max(np.abs(chunk))) if chunk.size else 0.0
            if peak > 1.0:
                chunk = chunk / peak
            return np.round(
                np.clip(chunk, -1, 1) * 32767.0
            ).astype("<i2")

        if return_timestamps:
            # NDJSON mode: one JSON line per segment as it completes —
            # base64 PCM16 + word timestamps offset to the stream's
            # global timeline (a raw audio/wav body has nowhere to put
            # stamps mid-stream). Line-oriented so a client can caption
            # while audio is still rendering.
            response = web.StreamResponse(
                status=200,
                headers={
                    "Content-Type": "application/x-ndjson",
                    "X-Segments": str(len(segments)),
                },
            )
            await response.prepare(request)
            offset = 0.0
            for i, task_id in enumerate(task_ids):
                parts = []
                async for chunk in manager.stream_result(task_id):
                    parts.append(chunk)
                status = await manager.get_task_status(task_id)
                if not status or status["status"] != "completed":
                    await response.write((json.dumps({
                        "segment": i,
                        "status": (status or {}).get("status", "unknown"),
                        "error": (status or {}).get("error"),
                    }) + "\n").encode())
                    # truncated transfer, not a clean end (same contract
                    # as the WAV path below)
                    response.force_close()
                    return response
                pcm = to_pcm16(
                    np.concatenate(parts)
                    if parts else np.zeros(0, np.float32)
                )
                task = manager.tasks[task_id]
                stamps = [
                    {
                        **w,
                        "start_s": round(w["start_s"] + offset, 4),
                        "end_s": round(w["end_s"] + offset, 4),
                    }
                    for w in (task.timestamps or [])
                ]
                await response.write((json.dumps({
                    "segment": i,
                    "status": "completed",
                    "audio_base64":
                        base64.b64encode(pcm.tobytes()).decode("ascii"),
                    "sample_rate": rate,
                    "format": "pcm16",
                    "offset_s": round(offset, 4),
                    "timestamps": stamps,
                }) + "\n").encode())
                offset += pcm.shape[0] / float(rate)
            await response.write_eof()
            return response
        response = web.StreamResponse(
            status=200,
            headers={
                "Content-Type": "audio/wav",
                "X-Segments": str(len(segments)),
            },
        )
        await response.prepare(request)
        # streaming WAV header (unknown length -> max RIFF size)
        header = (
            b"RIFF" + struct.pack("<I", 0xFFFFFFFF - 8) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
            + b"data" + struct.pack("<I", 0xFFFFFFFF - 44)
        )
        await response.write(header)
        for task_id in task_ids:
            async for chunk in manager.stream_result(task_id):
                await response.write(to_pcm16(chunk).tobytes())
            status = await manager.get_task_status(task_id)
            if status and status["status"] != "completed":
                # a failed/canceled segment must not masquerade as a
                # successful (shorter) stream: drop the connection
                # WITHOUT the terminal chunk so the client sees a
                # truncated transfer, not a clean end
                logger.error(
                    "stream segment %s %s: %s", task_id,
                    status["status"], status.get("error"),
                )
                response.force_close()
                return response
        await response.write_eof()
        return response

    async def openai_speech(request: web.Request) -> web.Response:
        """OpenAI-compatible ``POST /v1/audio/speech`` (drop-in for
        clients built against that API shape; beyond the reference's
        surface). Body: ``{model, input, voice, response_format, speed}``
        (+ ``pitch``, an extension). Returns raw audio bytes — WAV
        (PCM16 @24k) by default, ``response_format: "pcm"`` for headerless
        little-endian int16, ``response_format: "flac"`` for lossless
        FLAC (native encoder, audio/flac.py). The ``model`` field is
        accepted and ignored (one model is served); OpenAI's stock voice
        names map to the default voice when not present as packs."""
        user = _require_user(request)
        body = await _json_object(request)
        text = body.get("input")
        if not text or not isinstance(text, str):
            raise web.HTTPBadRequest(reason="missing 'input'")
        fmt = body.get("response_format", "wav")
        if fmt not in ("wav", "pcm", "flac"):
            raise web.HTTPBadRequest(
                reason=f"unsupported response_format {fmt!r}; use wav|pcm|flac"
            )
        manager: TTSServiceManager = request.app["service_manager"]
        voice = body.get("voice", "zf_001")
        stock = {"alloy", "ash", "coral", "echo", "fable", "onyx",
                 "nova", "sage", "shimmer", "verse"}
        loaded = getattr(manager.pipeline, "is_voice_loaded", None)
        if voice in stock and (
            loaded is None
            # cache-miss probes read packs from disk — off the loop
            # (same treatment as submit_task's load_voice)
            or not await asyncio.to_thread(loaded, voice)
        ):
            voice = "zf_001"
        speed = _parse_speed(body)
        try:
            # user_id rides through so scheduler fairness and
            # cancel_user_pending_tasks treat these like /tts traffic
            result = await _process_tts_request(
                manager, text, voice, user.get("user_id"), None, speed,
                output_format="pcm16",  # on-device quantization, half the
                # device->host transfer (responses are 16-bit anyway)
                pitch=_parse_pitch(body),
            )
        except ValueError as exc:
            raise web.HTTPBadRequest(reason=str(exc))
        if result["status"] == "error":
            err = result["error"] or "synthesis failed"
            if is_client_fault(err):
                raise web.HTTPBadRequest(reason=err)
            if result.get("timeout"):
                raise web.HTTPGatewayTimeout(reason=err)
            raise web.HTTPInternalServerError(reason=err)
        wav = base64.b64decode(result["audio_base64"])
        if fmt == "pcm":
            # strip the 44-byte canonical header this server writes
            return web.Response(body=wav[44:],
                                content_type="audio/pcm")
        if fmt == "flac":
            from ..audio.flac import encode_flac

            pcm = np.frombuffer(wav[44:], dtype="<i2")
            flac_bytes = await asyncio.to_thread(
                encode_flac, pcm, result.get("sample_rate", 24000)
            )
            return web.Response(body=flac_bytes, content_type="audio/flac")
        return web.Response(body=wav, content_type="audio/wav")

    app.router.add_post(f"{prefix}/tts", text_to_speech)
    app.router.add_post(f"{prefix}/tts/stream", tts_stream)
    app.router.add_post("/v1/audio/speech", openai_speech)
    app.router.add_get(f"{prefix}/tts/voices", get_voices)
    app.router.add_get(f"{prefix}/tts/info", get_info)
    app.router.add_get(f"{prefix}/tts/stats", get_stats)
    app.router.add_get("/metrics", get_metrics)
    if is_dev_mode():
        logger.info("dev mode enabled; adding dev endpoints")
        add_dev_routes(app, prefix)
    return app


def mount_tts_service(app, **kwargs):
    """FastAPI-compatible mount (works when fastapi is installed; this
    environment is aiohttp-native — use create_app instead)."""
    try:
        from .fastapi_compat import mount_tts_service as mount

        return mount(app, **kwargs)
    except ImportError as exc:
        raise ImportError(
            "fastapi is not installed; use "
            "illufly_tts_tpu.api.endpoints.create_app for the aiohttp app"
        ) from exc
