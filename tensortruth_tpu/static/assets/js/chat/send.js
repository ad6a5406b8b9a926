// Outbound chat messages: the one place a user message enters the WS
// (composer submit and per-message resend both land here).

import {el} from "../lib/dom.js";
import {addMessage} from "./messages.js";
import {isStreaming} from "./stream.js";
import {getWS} from "./ws.js";

// Send `text` (+ optional base64 images) over the open socket. Returns
// true when actually sent; callers clear their input only on success.
export function sendUserMessage(text, images) {
  const ws = getWS();
  if (!text || !ws || ws.readyState !== 1 || isStreaming()) return false;
  const wrap = addMessage("user", text);
  if (images && images.length)
    wrap.appendChild(el("div", "dim", `🖼 ${images.length} image(s)`));
  const payload = {message: text};
  if (images && images.length) payload.images = images;
  ws.send(JSON.stringify(payload));
  return true;
}

export function resendMessage(text) {
  sendUserMessage(text, null);
}

// First message of a freshly-opened session (project view's "Start chat"):
// the socket may still be CONNECTING right after connectWS — defer the
// send to its open event (reference: chatStore.pendingUserMessage drained
// by useChat once the WS is up).
export function sendWhenOpen(text) {
  const ws = getWS();
  if (!ws) return false;
  if (ws.readyState === 1) return sendUserMessage(text, null);
  ws.onopen = () => sendUserMessage(text, null);
  return true;
}
