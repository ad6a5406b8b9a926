// Tiny safe markdown renderer: escape first, then re-introduce markup.
// LLM output synthesized over fetched web content is untrusted, so only
// http(s) and same-origin relative URLs may reach href/src — javascript:
// and data: URIs and attribute breakouts must never execute (stored XSS
// via session history).

export function escapeHtml(s) {
  return s.replace(/&/g, "&amp;").replace(/</g, "&lt;").replace(/>/g, "&gt;")
          .replace(/"/g, "&quot;").replace(/'/g, "&#39;");
}

export function safeUrl(u) {
  u = u.trim();
  if (/^https?:\/\//i.test(u)) return u;
  if (/^\/(?!\/)/.test(u)) return u;  // relative, e.g. /api/sessions/.../images/x
  return null;
}

export function renderMarkdown(src) {
  const blocks = [];
  // fenced code blocks out first
  src = src.replace(/```([\s\S]*?)```/g, (_, code) => {
    blocks.push(`<pre><code>${escapeHtml(code.replace(/^\w*\n/, ""))}</code></pre>`);
    return "\u0000MD" + (blocks.length - 1) + "\u0000";
  });
  let html = escapeHtml(src);
  // pipe tables: contiguous |…| lines with a |---| separator row
  html = html.replace(/((?:^\|[^\n]*\|[ \t]*$\n?){2,})/gm, block => {
    const lines = block.trimEnd().split("\n");
    if (!/^\|[\s:|-]+\|$/.test(lines[1] || "")) return block;
    const cells = line => line.replace(/^\||\|$/g, "").split("|").map(c => c.trim());
    const head = cells(lines[0]);
    const rows = lines.slice(2).map(cells);
    return "<table><thead><tr>" + head.map(h => `<th>${h}</th>`).join("") +
      "</tr></thead><tbody>" +
      rows.map(r => "<tr>" + r.map(c => `<td>${c}</td>`).join("") + "</tr>").join("") +
      "</tbody></table>\n";
  });
  html = html
    .replace(/^###### (.*)$/gm, "<h6>$1</h6>")
    .replace(/^##### (.*)$/gm, "<h5>$1</h5>")
    .replace(/^#### (.*)$/gm, "<h4>$1</h4>")
    .replace(/^### (.*)$/gm, "<h3>$1</h3>")
    .replace(/^## (.*)$/gm, "<h2>$1</h2>")
    .replace(/^# (.*)$/gm, "<h1>$1</h1>")
    .replace(/^\s*[-*] (.*)$/gm, "<li>$1</li>")
    .replace(/(<li>[\s\S]*?<\/li>)(?!\s*<li>)/g, "<ul>$1</ul>")
    .replace(/`([^`\n]+)`/g, "<code>$1</code>")
    .replace(/\*\*([^*]+)\*\*/g, "<strong>$1</strong>")
    .replace(/\*([^*\n]+)\*/g, "<em>$1</em>")
    .replace(/!\[([^\]]*)\]\(([^)\s]+)\)/g, (m, alt, url) => {
      const u = safeUrl(url);
      return u ? `<img src="${u}" alt="${alt}" style="max-width:100%;border-radius:8px">` : m;
    })
    .replace(/\[([^\]]+)\]\(([^)\s]+)\)/g, (m, text, url) => {
      const u = safeUrl(url);
      return u ? `<a href="${u}" target="_blank" rel="noopener">${text}</a>` : m;
    })
    .replace(/\n{2,}/g, "<br><br>")
    .replace(/\n/g, "<br>");
  html = html.replace(/\u0000MD(\d+)\u0000/g, (_, i) => blocks[+i]);
  return html;
}
