// DOM helpers shared by every view module.
// (Reference keeps equivalents in frontend/src/lib/utils.ts.)

export function $(id) { return document.getElementById(id); }

export function el(tag, cls, text) {
  const e = document.createElement(tag);
  if (cls) e.className = cls;
  if (text !== undefined) e.textContent = text;
  return e;
}

export function toast(message, isError) {
  const t = el("div", "toast" + (isError ? " error" : ""), message);
  $("toasts").appendChild(t);
  setTimeout(() => t.remove(), 4500);
}
