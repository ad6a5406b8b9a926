// Typed client for the knowledge-catalog routes (reference
// frontend/src/api/modules.ts): built module indexes, known embedding
// models, registered rerankers.

import {api} from "./client.js";

export function listModules() { return api("/modules"); }
export function listEmbeddingModels() { return api("/embedding-models"); }
export function listRerankers() { return api("/rerankers"); }
