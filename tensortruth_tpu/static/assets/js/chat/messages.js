// Message rendering: bubbles, per-message actions, sources, retrieval
// metrics, tool-step timeline, thinking blocks (reference
// frontend/src/components/chat/*). Pure render helpers — streaming state
// lives in stream.js, the socket in ws.js.

import {deleteMessage} from "../api/sessions.js";
import {$, el, scrollMessages, toast} from "../lib/dom.js";
import {safeUrl} from "../lib/markdown.js";
import {currentSessionId} from "../stores/session.js";
import {resendMessage} from "./send.js";

export function copyText(text) {
  if (navigator.clipboard && navigator.clipboard.writeText)
    return navigator.clipboard.writeText(text).then(() => toast("copied"));
  const ta = document.createElement("textarea");
  ta.value = text;
  document.body.appendChild(ta);
  ta.select();
  document.execCommand("copy");
  ta.remove();
  toast("copied");
}

export function addMessage(role, text, opts) {
  opts = opts || {};
  const welcome = $("welcome-card");
  if (welcome) welcome.remove();  // first real message replaces the empty state
  const wrap = el("div", "msg " + role);
  const roleRow = el("div", "role", role);
  if (opts.timestamp) {
    const d = new Date(opts.timestamp);
    if (!isNaN(d)) roleRow.appendChild(el("span", "ts", d.toLocaleString()));
  }
  wrap.appendChild(roleRow);
  const body = el("div", "body", text || "");
  wrap.appendChild(body);
  const actions = el("div", "actions");
  const copyBtn = el("button", "", "⧉ copy");
  copyBtn.onclick = () => copyText(body.textContent);
  actions.appendChild(copyBtn);
  if (opts.index !== undefined) {
    const delBtn = el("button", "", "✕ delete");
    delBtn.onclick = async () => {
      await deleteMessage(currentSessionId(), opts.index);
      opts.onDelete && opts.onDelete();
    };
    actions.appendChild(delBtn);
  }
  if (role === "user") {
    const reBtn = el("button", "", "↻ resend");
    reBtn.onclick = () => resendMessage(body.textContent);
    actions.appendChild(reBtn);
    // Long pasted messages collapse to a fixed height with an expander
    // (reference MessageItem.tsx USER_MSG_COLLAPSED_PX behavior).
    if ((text || "").length > 1200) {
      body.classList.add("clamped");
      const more = el("button", "expand-btn", "⌄ show more");
      more.onclick = () => {
        const clamped = body.classList.toggle("clamped");
        more.textContent = clamped ? "⌄ show more" : "⌃ show less";
      };
      actions.appendChild(more);
    }
  }
  wrap.appendChild(actions);
  $("messages").appendChild(wrap);
  scrollMessages(true);
  return wrap;
}

// Empty-session welcome card (reference welcome/WelcomePage.tsx): example
// prompts that fill the composer, plus pointers to upload/manage.
const WELCOME_PROMPTS = [
  "What do my loaded modules cover?",
  "/web latest JAX pallas TPU kernel examples",
  "Summarize the uploaded document",
  "/help",
];

export function renderWelcome() {
  if ($("welcome-card")) return;
  const card = el("div", "welcome");
  card.id = "welcome-card";
  card.appendChild(el("h2", "", "TensorTruth TPU"));
  card.appendChild(el("p", "dim",
    "Ask about your indexed documentation, attach a document with 📄 " +
    "Upload, or start a /web research run. Retrieval runs on TPU; " +
    "generation uses your configured provider."));
  const list = el("div", "welcome-prompts");
  for (const p of WELCOME_PROMPTS) {
    const b = el("button", "hbtn", p);
    b.onclick = () => {
      $("input").value = p;
      $("input").focus();
      $("input").dispatchEvent(new Event("input"));
    };
    list.appendChild(b);
  }
  card.appendChild(list);
  $("messages").appendChild(card);
}

// Per-source fetch-status badge (reference WebSearchSources.tsx
// getStatusBadge): success renders nothing — badges flag the exceptions
// (failed / skipped / filtered) the way the reference greys them out.
const STATUS_BADGES = {failed: "failed", skipped: "skipped", filtered: "filtered"};

export function renderSources(container, sources) {
  if (!sources || !sources.length) return;
  const det = el("details", "sources");
  det.appendChild(el("summary", "", `${sources.length} sources`));
  for (const s of sources) {
    const item = el("div", "source-item");
    const score = el("span", "score", s.score != null ? s.score.toFixed(2) : "—");
    item.appendChild(score);
    item.appendChild(document.createTextNode(
      (s.title || s.metadata?.filename || s.id || "source") +
      (s.metadata?.module ? ` · ${s.metadata.module}` : "")));
    // source-type chip (reference SourceCard type badges): web sources
    // read differently from indexed chunks in a mixed orchestrator answer
    if (s.type && s.type !== "library_doc")
      item.appendChild(el("span", "src-badge type", s.type.replace(/_/g, " ")));
    if (STATUS_BADGES[s.status])
      item.appendChild(el("span", "src-badge " + s.status, STATUS_BADGES[s.status]));
    const srcUrl = s.url && safeUrl(s.url);
    if (srcUrl) {
      const a = el("a", "", " ↗"); a.href = srcUrl; a.target = "_blank"; item.appendChild(a);
    }
    if (s.error) {
      item.appendChild(el("div", "src-error", s.error));
    }
    const body = s.content || s.snippet;  // failed fetches still show their snippet
    if (body) {
      const preview = el("div", "preview", String(body).slice(0, 1500));
      item.appendChild(preview);
      item.onclick = ev => {
        if (ev.target.tagName === "A") return;
        item.classList.toggle("open");
      };
    }
    det.appendChild(item);
  }
  container.appendChild(det);
}

// Full retrieval-metrics display (retrieval/metrics.py schema ≡ reference
// services/retrieval_metrics.py): score distribution, diversity, coverage,
// quality ratios — expandable per message, summary line always visible.
export function renderMetrics(container, metrics, confidence) {
  if (!metrics || !metrics.coverage) return;
  const det = el("details", "metrics");
  const sd = metrics.score_distribution || {};
  const dv = metrics.diversity || {};
  const cv = metrics.coverage || {};
  const ql = metrics.quality || {};
  const sum = el("summary", "",
    `chunks ${cv.total_chunks} · ~${cv.estimated_tokens} tok · best ${(sd.max ?? 0).toFixed?.(2) ?? "—"}`);
  if (confidence) {
    const cls = confidence === "normal" ? "normal" : confidence === "low" ? "low" : "none";
    sum.appendChild(el("span", "conf-badge " + cls, confidence));
  }
  det.appendChild(sum);
  const grid = el("div", "mgrid");
  const put = (k, v) => {
    const d = el("div", "", k + " ");
    const b = el("b", "", v == null ? "—" : String(v));
    d.appendChild(b);
    grid.appendChild(d);
  };
  const f2 = x => x == null ? null : (+x).toFixed(2);
  put("score mean", f2(sd.mean)); put("median", f2(sd.median));
  put("min", f2(sd.min)); put("max", f2(sd.max)); put("std", f2(sd.std));
  put("unique sources", dv.unique_sources); put("doc types", dv.unique_doc_types);
  put("entropy", f2(dv.source_entropy));
  put("chunks", cv.total_chunks); put("chars", cv.total_chars);
  put("est tokens", cv.estimated_tokens);
  put("high-score ratio", f2(ql.high_score_ratio));
  put("low-score ratio", f2(ql.low_score_ratio));
  det.appendChild(grid);
  container.appendChild(det);
}

// Per-message tool-call timeline: accumulated from tool_progress events
// during streaming (reference MessageToolSteps display).
// Post-stream generation stats (reference ResponseStats on MessageItem):
// token estimate, wall time, throughput from the done message.
export function renderStats(container, stats) {
  if (!stats || !stats.est_tokens) return;
  const bits = [`≈${stats.est_tokens} tok`];
  if (stats.duration_ms != null) bits.push(`${(stats.duration_ms / 1000).toFixed(1)} s`);
  if (stats.tokens_per_s != null) bits.push(`${stats.tokens_per_s} tok/s`);
  container.appendChild(el("div", "gen-stats", bits.join(" · ")));
}

export function renderToolSteps(container, steps) {
  if (!steps || !steps.length) return;
  const det = el("details", "toolsteps");
  det.appendChild(el("summary", "", `${steps.length} tool steps`));
  for (const s of steps) {
    const d = el("div", "toolstep");
    d.appendChild(el("span", "tname", s.tool || "tool"));
    d.appendChild(document.createTextNode(" — " + (s.message || s.phase || "")));
    det.appendChild(d);
  }
  container.appendChild(det);
}

export function renderThinking(container, text, opts) {
  // opts.before: insert ahead of that node (live streaming places the block
  // above the message body); opts.open: start expanded. Used by both the
  // session-reload path and ws.js's live thinking handler — one DOM shape.
  opts = opts || {};
  if (!text && !opts.open) return null;
  const det = el("details", "thinking");
  det.appendChild(el("summary", "", "thinking"));
  det.appendChild(el("div", "tbody", text || ""));
  if (opts.open) det.open = true;
  if (opts.before) container.insertBefore(det, opts.before);
  else container.appendChild(det);
  return det;
}
