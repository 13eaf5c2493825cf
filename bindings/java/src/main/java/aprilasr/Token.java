package aprilasr;

/** One recognized token (piece text, log-probability, flags, timestamp).
 *
 * Mirrors the reference Java binding's Token (reference:
 * bindings/java/lib/lib/src/main/java/aprilasr/Token.java — same surface,
 * written fresh). */
public final class Token {
    private final String token;
    private final float logProb;
    private final int flags;
    private final long timeMs;

    Token(String token, float logProb, int flags, long timeMs) {
        this.token = token;
        this.logProb = logProb;
        this.flags = flags;
        this.timeMs = timeMs;
    }

    public String getToken() {
        return token;
    }

    public float getLogProb() {
        return logProb;
    }

    /** True if this token starts a new word (leading-space piece). */
    public boolean isWordBoundary() {
        return (flags & AprilTpuLibrary.APRIL_TOKEN_FLAG_WORD_BOUNDARY_BIT) != 0;
    }

    /** True if this token ends a sentence (., !, ?). */
    public boolean isSentenceEnd() {
        return (flags & AprilTpuLibrary.APRIL_TOKEN_FLAG_SENTENCE_END_BIT) != 0;
    }

    /** Audio time of emission in milliseconds (advanced by fed samples only). */
    public long getTimeMs() {
        return timeMs;
    }

    @Override
    public String toString() {
        return token;
    }
}
