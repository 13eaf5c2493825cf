/* C API for april_asr_tpu — reference-compatible ABI surface.
 *
 * Function names, types, and semantics follow the reference library's public
 * header (reference: april_api.h:58-196; written fresh for this framework).
 * Unlike the reference's in-process library, this implementation is a thin
 * client: models and sessions live in an `april-serve` process (typically on
 * a TPU host) and this library streams PCM16 to it over TCP. Consequences:
 *
 *   - aam_create_model() takes "host:port" of a running april-serve (it also
 *     accepts "tcp://host:port"); a filesystem path is an error.
 *   - every session behaves like the reference's ARPIL_CONFIG_FLAG_ASYNC_NO_RT
 *     mode: the handler fires on a background reader thread.
 *   - AprilConfig.speaker (reserved-but-unimplemented in the reference,
 *     april_api.h:78-84) has a real effect: a non-zero id is forwarded to
 *     the server, which restores that speaker's saved session state into
 *     the slot and snapshots it back on disconnect.
 *   - aas_realtime_get_speedup() queries the server (opcode 5) for this
 *     session's live estimate: how much faster than realtime its audio must
 *     be consumed for the engine to keep up (>1 = falling behind; the
 *     reference's degrade-gracefully telemetry, april_api.h:188-192).
 *
 * C#/Java can P/Invoke/JNA this library exactly like the reference's.
 */

#ifndef APRIL_TPU_API_H
#define APRIL_TPU_API_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

#define APRIL_VERSION 1

typedef struct AprilASRModel_i *AprilASRModel;
typedef struct AprilASRSession_i *AprilASRSession;

typedef enum AprilResultType {
  APRIL_RESULT_UNKNOWN = 0,
  /* tokens so far in the live window; superseded by the next call */
  APRIL_RESULT_RECOGNITION_PARTIAL = 1,
  /* utterance finalized; the window restarts */
  APRIL_RESULT_RECOGNITION_FINAL = 2,
  /* audio was dropped because the pipeline cannot keep up */
  APRIL_RESULT_ERROR_CANT_KEEP_UP = 3,
  /* >= 2.2 s without emission; context reset */
  APRIL_RESULT_SILENCE = 4
} AprilResultType;

enum AprilTokenFlagBits {
  APRIL_TOKEN_FLAG_WORD_BOUNDARY_BIT = 0x00000001,
  APRIL_TOKEN_FLAG_SENTENCE_END_BIT = 0x00000002
};
typedef uint32_t AprilTokenFlags;

typedef struct AprilToken {
  /* UTF-8 piece text (leading space = word boundary). Owned by the session;
   * valid only during the handler call. */
  const char *token;
  float logprob;
  AprilTokenFlags flags;
  /* audio time of emission in ms (advanced only by fed samples) */
  size_t time_ms;
  void *reserved;
} AprilToken;

typedef void (*AprilRecognitionResultHandler)(void *userdata,
                                              AprilResultType result,
                                              size_t count,
                                              const AprilToken *tokens);

typedef enum AprilConfigFlagBits {
  APRIL_CONFIG_FLAG_ZERO_BIT = 0,
  APRIL_CONFIG_FLAG_ASYNC_RT_BIT = 0x00000001,
  APRIL_CONFIG_FLAG_ASYNC_NO_RT_BIT = 0x00000002
} AprilConfigFlagBits;
typedef uint32_t AprilConfigFlags;

typedef struct AprilSpeakerID {
  uint8_t data[16];
} AprilSpeakerID;

typedef struct AprilConfig {
  AprilSpeakerID speaker;
  AprilRecognitionResultHandler handler;
  void *userdata;
  AprilConfigFlags flags;
} AprilConfig;

/* Call once before anything else with APRIL_VERSION. */
void aam_api_init(int version);

/* Connect to an april-serve endpoint ("host:port" or "tcp://host:port").
 * Returns NULL on failure. */
AprilASRModel aam_create_model(const char *endpoint);

const char *aam_get_name(AprilASRModel model);
const char *aam_get_description(AprilASRModel model);
const char *aam_get_language(AprilASRModel model);
size_t aam_get_sample_rate(AprilASRModel model);

void aam_free(AprilASRModel model);

/* Open a streaming session. config.handler is required. */
AprilASRSession aas_create_session(AprilASRModel model, AprilConfig config);

/* Feed 16-bit mono PCM at the model sample rate. */
void aas_feed_pcm16(AprilASRSession session, short *pcm16, size_t count);

/* Process buffered audio and force a final result. */
void aas_flush(AprilASRSession session);

/* Realtime speedup factor for this session, fetched live from the server
 * (blocks up to ~250 ms for a fresh sample; returns the last known value,
 * initially 1.0, on timeout or transport failure). */
float aas_realtime_get_speedup(AprilASRSession session);

void aas_free(AprilASRSession session);

#ifdef __cplusplus
}
#endif

#endif /* APRIL_TPU_API_H */
