# SPDX-License-Identifier: Apache-2.0
"""Minimal asyncio HTTP/1.1 server (no external web framework in this
environment — the reference rides vLLM's FastAPI server; this stdlib
implementation provides the same surface: JSON request/response routing and
chunked server-sent-event streaming)."""
from __future__ import annotations

import asyncio
import json
import traceback
from typing import Any, AsyncIterator, Callable, Optional
from urllib.parse import urlparse

from vllm_neuron_tpu.utils import init_logger

logger = init_logger(__name__)

_MAX_BODY = 512 * 1024 * 1024
_REASONS = {200: "OK", 400: "Bad Request", 404: "Not Found",
            422: "Unprocessable Entity", 500: "Internal Server Error",
            503: "Service Unavailable"}


class Request:
    __slots__ = ("method", "path", "query", "headers", "body")

    def __init__(self, method: str, path: str, query: str, headers: dict,
                 body: bytes):
        self.method = method
        self.path = path
        self.query = query
        self.headers = headers
        self.body = body

    def json(self) -> Any:
        if not self.body:
            return {}
        return json.loads(self.body)


class JSONResponse:
    def __init__(self, obj: Any, status: int = 200):
        self.obj = obj
        self.status = status


class TextResponse:
    def __init__(self, text: str, status: int = 200,
                 media_type: str = "text/plain; version=0.0.4"):
        self.text = text
        self.status = status
        self.media_type = media_type


class StreamingResponse:
    """Server-sent events: the handler returns an async iterator of `data:`
    payload strings (already JSON-encoded); we frame and chunk them."""

    def __init__(self, iterator: AsyncIterator[str],
                 media_type: str = "text/event-stream"):
        self.iterator = iterator
        self.media_type = media_type


class HTTPServer:

    def __init__(self):
        # (method, path) -> handler(Request) -> JSONResponse|StreamingResponse
        self.routes: dict[tuple[str, str], Callable] = {}

    def route(self, method: str, path: str):
        def deco(fn):
            self.routes[(method, path)] = fn
            return fn
        return deco

    async def serve(self, host: str, port: int) -> asyncio.AbstractServer:
        server = await asyncio.start_server(self._handle_conn, host, port)
        logger.info("HTTP server listening on %s:%d", host, port)
        return server

    # ------------------------------------------------------------------

    async def _handle_conn(self, reader: asyncio.StreamReader,
                           writer: asyncio.StreamWriter) -> None:
        try:
            while True:
                request = await self._read_request(reader)
                if request is None:
                    break
                keep_alive = request.headers.get("connection",
                                                 "keep-alive") != "close"
                await self._dispatch(request, writer)
                if not keep_alive:
                    break
        except (asyncio.IncompleteReadError, ConnectionResetError):
            pass
        except Exception:
            logger.error("connection error:\n%s", traceback.format_exc())
        finally:
            try:
                writer.close()
                await writer.wait_closed()
            except Exception:
                pass

    async def _read_request(self, reader) -> Optional[Request]:
        try:
            head = await reader.readuntil(b"\r\n\r\n")
        except (asyncio.IncompleteReadError, asyncio.LimitOverrunError):
            return None
        lines = head.decode("latin-1").split("\r\n")
        try:
            method, target, _ = lines[0].split(" ", 2)
        except ValueError:
            return None
        headers = {}
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", 0))
        if length > _MAX_BODY:
            return None
        body = await reader.readexactly(length) if length else b""
        parsed = urlparse(target)
        return Request(method.upper(), parsed.path, parsed.query, headers,
                       body)

    async def _dispatch(self, request: Request,
                        writer: asyncio.StreamWriter) -> None:
        handler = self.routes.get((request.method, request.path))
        if handler is None:
            await self._write_json(writer, JSONResponse(
                {"error": {"message": f"Not Found: {request.path}",
                           "type": "invalid_request_error"}}, 404))
            return
        try:
            result = handler(request)
            if asyncio.iscoroutine(result):
                result = await result
        except json.JSONDecodeError as e:
            result = JSONResponse(
                {"error": {"message": f"invalid JSON: {e}",
                           "type": "invalid_request_error"}}, 400)
        except ValueError as e:
            result = JSONResponse(
                {"error": {"message": str(e),
                           "type": "invalid_request_error"}}, 400)
        except Exception:
            logger.error("handler error:\n%s", traceback.format_exc())
            result = JSONResponse(
                {"error": {"message": "internal server error",
                           "type": "internal_error"}}, 500)
        if isinstance(result, StreamingResponse):
            await self._write_stream(writer, result)
        elif isinstance(result, TextResponse):
            await self._write_text(writer, result)
        else:
            await self._write_json(writer, result)

    async def _write_text(self, writer, response: "TextResponse") -> None:
        payload = response.text.encode()
        reason = _REASONS.get(response.status, "")
        head = (f"HTTP/1.1 {response.status} {reason}\r\n"
                f"Content-Type: {response.media_type}\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n")
        writer.write(head.encode() + payload)
        await writer.drain()

    async def _write_json(self, writer, response: JSONResponse) -> None:
        payload = json.dumps(response.obj).encode()
        reason = _REASONS.get(response.status, "")
        head = (f"HTTP/1.1 {response.status} {reason}\r\n"
                f"Content-Type: application/json\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n")
        writer.write(head.encode() + payload)
        await writer.drain()

    async def _write_stream(self, writer,
                            response: StreamingResponse) -> None:
        head = (f"HTTP/1.1 200 OK\r\n"
                f"Content-Type: {response.media_type}\r\n"
                f"Cache-Control: no-cache\r\n"
                f"Transfer-Encoding: chunked\r\n\r\n")
        writer.write(head.encode())
        await writer.drain()

        async def send_chunk(data: bytes):
            writer.write(f"{len(data):x}\r\n".encode() + data + b"\r\n")
            await writer.drain()

        try:
            async for payload in response.iterator:
                await send_chunk(f"data: {payload}\n\n".encode())
            await send_chunk(b"data: [DONE]\n\n")
        finally:
            writer.write(b"0\r\n\r\n")
            await writer.drain()
